"""Bijector core: invertible transforms as pure functions over pytree params.

TPU-native redesign of the reference's ``nn.Module`` flows
(``nnest/networks.py:17-42``): instead of stateful modules, each bijector is a
frozen (hashable) dataclass of static config with three pure methods:

- ``init(key, x) -> (params, y)``: create params; ``x`` is a data batch used
  for data-dependent initialization (ActNorm, reference
  ``networks.py:698-705``) and is threaded forward so downstream bijectors in
  a chain see transformed activations. Returns the forward-transformed batch.
- ``forward(params, x) -> (z, logdet)`` with ``x`` (batch, dim) and logdet
  (batch,).
- ``inverse(params, z) -> (x, logdet)``. Total functions: no exceptions — the
  reference's out-of-domain ``ValueError`` control flow
  (``networks.py:467-468``) is replaced by identity tails / masked selects,
  which is legal under ``jit`` and is the intended Durkan et al. behaviour.

This makes every flow trivially compatible with ``jit``/``vmap``/``scan``/
``grad`` and with sharded params under ``jax.sharding``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Bijector:
    """Static config for an invertible transform. Subclasses implement
    init/forward/inverse as pure functions of (params, data)."""

    def init(self, key, x):
        raise NotImplementedError

    def forward(self, params, x):
        raise NotImplementedError

    def inverse(self, params, z):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Chain(Bijector):
    """Sequential composition with logdet accumulation (equivalent of the
    reference's ``NormalizingFlow`` container, ``networks.py:17-42``)."""

    bijectors: tuple

    def init(self, key, x):
        params = []
        for b in self.bijectors:
            key, sub = jax.random.split(key)
            p, x = b.init(sub, x)
            params.append(p)
        return tuple(params), x

    def forward(self, params, x):
        logdet = jnp.zeros(x.shape[0], dtype=x.dtype)
        for b, p in zip(self.bijectors, params):
            x, ld = b.forward(p, x)
            logdet = logdet + ld
        return x, logdet

    def inverse(self, params, z):
        logdet = jnp.zeros(z.shape[0], dtype=z.dtype)
        for b, p in zip(reversed(self.bijectors), reversed(params)):
            z, ld = b.inverse(p, z)
            logdet = logdet + ld
        return z, logdet
