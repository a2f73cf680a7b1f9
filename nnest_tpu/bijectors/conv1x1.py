"""Glow-style invertible 1x1 convolution with PLU parameterization.

Equivalent of the reference's ``Invertible1x1Conv`` (``nnest/networks.py:
625-658``): W = P L (U + diag(S)) with P a fixed permutation from the LU
decomposition of a random orthogonal init; logdet = sum(log|S|).

The fixed permutation is stored in params under the key ``'_P'``; keys with a
leading underscore are frozen buffers (zero-masked out of the optimizer by the
Trainer — see training/trainer.py) mirroring torch's non-Parameter attribute.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from nnest_tpu.bijectors.base import Bijector

_PRECISION = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class Invertible1x1Conv(Bijector):
    dim: int

    def init(self, key, x):
        q = jax.random.orthogonal(key, self.dim, dtype=jnp.float32)
        p, l, u = jax.scipy.linalg.lu(q)
        params = {
            '_P': p,
            'L': l,
            'S': jnp.diag(u),
            'U': jnp.triu(u, k=1),
        }
        y = x if x is None else self.forward(params, x)[0]
        return params, y

    def _assemble(self, params):
        d = self.dim
        L = jnp.tril(params['L'], k=-1) + jnp.eye(d, dtype=jnp.float32)
        U = jnp.triu(params['U'], k=1) + jnp.diag(params['S'])
        W = jnp.dot(jnp.dot(params['_P'], L, precision=_PRECISION), U,
                    precision=_PRECISION)
        return W

    def forward(self, params, x):
        W = self._assemble(params)
        z = jnp.dot(x, W, precision=_PRECISION)
        logdet = jnp.broadcast_to(jnp.sum(jnp.log(jnp.abs(params['S']))),
                                  (x.shape[0],))
        return z, logdet

    def inverse(self, params, z):
        W = self._assemble(params)
        # x W = z  →  solve W^T x^T = z^T
        x = jnp.linalg.solve(W.T, z.T).T
        logdet = jnp.broadcast_to(-jnp.sum(jnp.log(jnp.abs(params['S']))),
                                  (z.shape[0],))
        return x, logdet
