"""Learnable lower-triangular (Cholesky-whitening) linear flow.

Equivalent of the reference's ``Choleksy`` [sic] transform
(``nnest/networks.py:162-239``): y = L x + b with L lower triangular and a
softplus-positive diagonal, so logdet = sum(log diag(L)). The inverse uses a
triangular solve. The public flow key keeps both the reference's misspelling
('choleksy') and the correct spelling (see flows/factory.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nnest_tpu.bijectors.base import Bijector

# Triangular solves / matmuls here must be exact f32: TPU may otherwise drop
# matmuls to bf16, which would break the 1e-5 round-trip contract
# (reference tests/test_flows.py:8).
_PRECISION = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class CholeskyLinear(Bijector):
    dim: int
    identity_init: bool = True
    eps: float = 1e-3

    def init(self, key, x):
        n_tri = (self.dim - 1) * self.dim // 2
        if self.identity_init:
            lower = jnp.zeros((n_tri,), jnp.float32)
            const = float(np.log(np.exp(1.0 - self.eps) - 1.0))
            udiag = jnp.full((self.dim,), const, jnp.float32)
        else:
            kl, kd = jax.random.split(key)
            stdv = 1.0 / np.sqrt(self.dim)
            lower = jax.random.uniform(kl, (n_tri,), jnp.float32, -stdv, stdv)
            udiag = jax.random.uniform(kd, (self.dim,), jnp.float32, -stdv, stdv)
        params = {'bias': jnp.zeros((self.dim,), jnp.float32),
                  'lower': lower, 'udiag': udiag}
        y = x if x is None else self.forward(params, x)[0]
        return params, y

    def _matrix(self, params):
        d = self.dim
        tril_r, tril_c = np.tril_indices(d, k=-1)
        L = jnp.zeros((d, d), jnp.float32)
        if len(tril_r) > 0:
            L = L.at[tril_r, tril_c].set(params['lower'])
        diag = jax.nn.softplus(params['udiag']) + self.eps
        L = L.at[jnp.arange(d), jnp.arange(d)].set(diag)
        return L, diag

    def forward(self, params, x):
        L, diag = self._matrix(params)
        y = jnp.dot(x, L.T, precision=_PRECISION) + params['bias']
        logdet = jnp.broadcast_to(jnp.sum(jnp.log(diag)), (x.shape[0],))
        return y, logdet

    def inverse(self, params, z):
        L, diag = self._matrix(params)
        rhs = (z - params['bias']).T
        x = jax.scipy.linalg.solve_triangular(L, rhs, lower=True).T
        logdet = jnp.broadcast_to(-jnp.sum(jnp.log(diag)), (z.shape[0],))
        return x, logdet

    def covariance(self, params):
        """C = P P^T with P = L^{-1} (reference ``networks.py:217-225``)."""
        L, _ = self._matrix(params)
        p = jnp.linalg.inv(L)
        return p @ p.T
