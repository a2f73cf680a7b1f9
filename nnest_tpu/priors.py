"""Priors (reference ``nnest/priors.py``).

JAX-native: ``logpdf`` is a per-point pure-JAX function usable inside jitted
kernels (returns 0 in the box, -inf outside — reference ``priors.py:39-43``),
``sample`` takes an explicit PRNG key (a numpy RandomState fallback keeps the
reference's keyless call signature working).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class Prior:
    def __init__(self, x_dim: int):
        self.x_dim = x_dim
        self._batched = jax.jit(jax.vmap(self.logpdf))

    def logpdf(self, x):
        raise NotImplementedError

    def __call__(self, x):
        if isinstance(x, list):
            x = np.asarray(x)
        x = jnp.asarray(x, dtype=jnp.float32)
        if x.ndim > 1:
            return np.asarray(self._batched(x), dtype=np.float64)
        return float(self.logpdf(x))

    def sample(self, num_samples):
        raise NotImplementedError


class UniformPrior(Prior):
    """Box prior on [minimum, maximum]^dim. The NestedSampler hard-codes the
    unit cube as [-1, 1]^dim (reference ``nested.py:76``); the user
    ``transform`` maps it to physical space."""

    def __init__(self, x_dim: int, minimum, maximum):
        if not hasattr(minimum, '__len__'):
            minimum = [minimum] * x_dim
        if not hasattr(maximum, '__len__'):
            maximum = [maximum] * x_dim
        assert len(minimum) == x_dim and len(maximum) == x_dim
        self.minimum = np.asarray(minimum, dtype=np.float64)
        self.maximum = np.asarray(maximum, dtype=np.float64)
        self._rng = np.random.default_rng(0)
        super().__init__(x_dim)

    def logpdf(self, x):
        lo = jnp.asarray(self.minimum, dtype=x.dtype)
        hi = jnp.asarray(self.maximum, dtype=x.dtype)
        inside = jnp.all((x >= lo) & (x <= hi))
        return jnp.where(inside, 0.0, -jnp.inf)

    def seed(self, seed: int):
        self._rng = np.random.default_rng(seed)

    def sample(self, num_samples, key=None):
        if key is not None:
            lo = jnp.asarray(self.minimum, dtype=jnp.float32)
            hi = jnp.asarray(self.maximum, dtype=jnp.float32)
            u = jax.random.uniform(key, (num_samples, self.x_dim),
                                   dtype=jnp.float32)
            return lo + (hi - lo) * u
        u = self._rng.uniform(size=(num_samples, self.x_dim))
        return self.minimum + (self.maximum - self.minimum) * u

    def sample_jax(self, key, num_samples):
        """Pure-JAX sampling for use inside jitted kernels."""
        lo = jnp.asarray(self.minimum, dtype=jnp.float32)
        hi = jnp.asarray(self.maximum, dtype=jnp.float32)
        u = jax.random.uniform(key, (num_samples, self.x_dim),
                               dtype=jnp.float32)
        return lo + (hi - lo) * u
