"""Base distributions for the latent space of a normalizing flow.

Functional, stateless, explicit-PRNG equivalents of the base distributions the
reference plugs into its flows: a standard multivariate normal
(``nnest/networks.py:51-57``), the generalised normal used for box-like
latents (``nnest/distributions/generalised_normal.py``), and the
logit-uniform TransformedDistribution exercised by the reference flow tests
(``tests/test_flows.py:12-18``).

All distributions are frozen dataclasses (hashable, safe to close over under
``jax.jit``) with:

- ``sample(key, num)   -> (num, dim) float32``
- ``log_prob(z)        -> (batch,)`` (summed over dims)
- ``usample(key, num)  -> (num, dim)`` uniform-in-box proposal used by the
  rejection-flow envelope (reference ``generalised_normal.py:57-59``); only
  distributions with approximately bounded support provide it.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BaseDistribution:
    """Interface for flow base (latent) distributions."""

    dim: int

    def sample(self, key, num: int) -> jax.Array:
        raise NotImplementedError

    def log_prob(self, z: jax.Array) -> jax.Array:
        raise NotImplementedError

    @property
    def has_usample(self) -> bool:
        return False


@dataclasses.dataclass(frozen=True)
class DiagNormal(BaseDistribution):
    """Standard normal N(0, I_dim), the default flow base distribution
    (reference ``nnest/networks.py:51-57``)."""

    def sample(self, key, num: int) -> jax.Array:
        return jax.random.normal(key, (num, self.dim), dtype=jnp.float32)

    def log_prob(self, z: jax.Array) -> jax.Array:
        z = jnp.asarray(z)
        return jnp.sum(-0.5 * z ** 2 - 0.5 * math.log(2.0 * math.pi), axis=-1)


@dataclasses.dataclass(frozen=True)
class GeneralisedNormal(BaseDistribution):
    """Generalised (exponential-power) normal with shape ``beta``.

    beta=2 is Gaussian; beta→∞ approaches uniform on [loc-scale, loc+scale].
    Matches the reference's scipy-backed distribution
    (``nnest/distributions/generalised_normal.py:49-67``): sampling uses the
    gamma construction X = loc + scale * s * G^{1/beta}, G ~ Gamma(1/beta),
    s = ±1, which is exactly how ``scipy.stats.gennorm.rvs`` draws.
    """

    beta: float = 8.0
    loc: float = 0.0
    scale: float = 1.0

    def sample(self, key, num: int) -> jax.Array:
        kg, ks = jax.random.split(key)
        g = jax.random.gamma(kg, 1.0 / self.beta, (num, self.dim), dtype=jnp.float32)
        sign = jax.random.rademacher(ks, (num, self.dim), dtype=jnp.float32)
        return self.loc + self.scale * sign * g ** (1.0 / self.beta)

    def log_prob(self, z: jax.Array) -> jax.Array:
        z = jnp.asarray(z)
        lp = (-(jnp.abs(z - self.loc) / self.scale) ** self.beta
              + math.log(self.beta) - math.log(self.scale)
              - math.log(2.0) - math.lgamma(1.0 / self.beta))
        return jnp.sum(lp, axis=-1)

    @property
    def has_usample(self) -> bool:
        return True

    def usample(self, key, num: int) -> jax.Array:
        """Uniform in the box [-1, 1]^dim (reference
        ``generalised_normal.py:57-59``)."""
        return jax.random.uniform(key, (num, self.dim), dtype=jnp.float32,
                                  minval=-1.0, maxval=1.0)


@dataclasses.dataclass(frozen=True)
class LogitUniform(BaseDistribution):
    """logit(U[0,1]) per dimension — the standard logistic distribution.

    Equivalent of the reference test's
    ``TransformedDistribution(Uniform(0,1), SigmoidTransform().inv)``
    (``tests/test_flows.py:13``).
    """

    def sample(self, key, num: int) -> jax.Array:
        u = jax.random.uniform(key, (num, self.dim), dtype=jnp.float32,
                               minval=1e-7, maxval=1.0 - 1e-7)
        return jnp.log(u) - jnp.log1p(-u)

    def log_prob(self, z: jax.Array) -> jax.Array:
        z = jnp.asarray(z)
        # logistic pdf: e^{-z} / (1 + e^{-z})^2
        lp = -z - 2.0 * jax.nn.softplus(-z)
        return jnp.sum(lp, axis=-1)
