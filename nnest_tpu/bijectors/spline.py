"""Neural spline flow coupling layer (NSF-CL), Durkan et al. 2019.

Equivalent of the reference's ``NSF_CL`` (``nnest/networks.py:559-622``),
including odd-dimension support (lower half gets the extra dim). Each call
transforms one half with an RQS whose knots are predicted from the other half
by a 4-layer LeakyReLU(0.2) MLP (``networks.py:393-409``).

The reference's double normalization quirk is preserved: the conditioner
output is softmaxed and scaled by 2B (``networks.py:584-586``) before being
handed to the RQS, which normalizes again (``networks.py:477-489``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from nnest_tpu.bijectors.base import Bijector
from nnest_tpu.bijectors.mlp import mlp_init, mlp_apply
from nnest_tpu.bijectors.rqs import rqs


@dataclasses.dataclass(frozen=True)
class SplineCoupling(Bijector):
    dim: int
    num_bins: int = 5
    tail_bound: float = 3.0
    hidden: int = 8

    @property
    def half_dim(self) -> int:
        return self.dim // 2

    @property
    def even(self) -> bool:
        return self.dim == 2 * self.half_dim

    def _net_sizes(self, n_in, n_out_dims):
        return [n_in, self.hidden, self.hidden, self.hidden,
                (3 * self.num_bins - 1) * n_out_dims]

    def init(self, key, x):
        k1, k2 = jax.random.split(key)
        h = self.half_dim
        if self.even:
            params = {'f1': mlp_init(k1, self._net_sizes(h, h)),
                      'f2': mlp_init(k2, self._net_sizes(h, h))}
        else:
            # lower half has h+1 dims, upper half has h dims
            params = {'f1': mlp_init(k1, self._net_sizes(h + 1, h)),
                      'f2': mlp_init(k2, self._net_sizes(h, h + 1))}
        y = x if x is None else self.forward(params, x)[0]
        return params, y

    def _split(self, v):
        cut = self.half_dim if self.even else self.half_dim + 1
        return v[:, :cut], v[:, cut:]

    def _knots(self, net_params, cond, n_dims):
        """Conditioner → (W, H, D) with the reference's pre-normalization."""
        K, B = self.num_bins, self.tail_bound
        out = mlp_apply(net_params, cond, 'leaky_relu')
        out = out.reshape(cond.shape[0], n_dims, 3 * K - 1)
        W, H, D = out[..., :K], out[..., K:2 * K], out[..., 2 * K:]
        W = 2.0 * B * jax.nn.softmax(W, axis=-1)
        H = 2.0 * B * jax.nn.softmax(H, axis=-1)
        D = jax.nn.softplus(D)
        return W, H, D

    def forward(self, params, x):
        lower, upper = self._split(x)
        W, H, D = self._knots(params['f1'], lower, upper.shape[1])
        upper, ld1 = rqs(upper, W, H, D, inverse=False,
                         tail_bound=self.tail_bound)
        W, H, D = self._knots(params['f2'], upper, lower.shape[1])
        lower, ld2 = rqs(lower, W, H, D, inverse=False,
                         tail_bound=self.tail_bound)
        logdet = jnp.sum(ld1, axis=-1) + jnp.sum(ld2, axis=-1)
        return jnp.concatenate([lower, upper], axis=1), logdet

    def inverse(self, params, z):
        lower, upper = self._split(z)
        W, H, D = self._knots(params['f2'], upper, lower.shape[1])
        lower, ld1 = rqs(lower, W, H, D, inverse=True,
                         tail_bound=self.tail_bound)
        W, H, D = self._knots(params['f1'], lower, upper.shape[1])
        upper, ld2 = rqs(upper, W, H, D, inverse=True,
                         tail_bound=self.tail_bound)
        logdet = jnp.sum(ld1, axis=-1) + jnp.sum(ld2, axis=-1)
        return jnp.concatenate([lower, upper], axis=1), logdet
