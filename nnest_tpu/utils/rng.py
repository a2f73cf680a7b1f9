"""Shared PRNG helpers.

An *eager* ``jax.random.split`` is a full remote dispatch per call on the
axon TPU tunnel (profiled ~0.8 s/call); these are compiled once.
``tuple()`` inside the jit avoids an eager getitem on the result.
"""

from __future__ import annotations

import jax

split_key = jax.jit(lambda k: tuple(jax.random.split(k)))
