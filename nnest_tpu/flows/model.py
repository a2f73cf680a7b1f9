"""Flow models: (base distribution, bijector chain) pairs.

Equivalents of the reference's ``NormalizingFlowModel``
(``nnest/networks.py:45-84``) and ``FastSlowNormalizingFlowModel``
(``networks.py:87-153``), as frozen dataclasses with pure methods over pytree
params. Convention throughout: ``forward`` maps data x → latent z,
``inverse`` maps latent z → data x, logdets are (batch,) and antisymmetric.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from nnest_tpu.bijectors.base import Chain
from nnest_tpu.bijectors.affine import AffineCoupling
from nnest_tpu.distributions import BaseDistribution


@dataclasses.dataclass(frozen=True)
class FlowModel:
    """Single-speed flow: z = chain(x); log p(x) = base.log_prob(z) + logdet."""

    dim: int
    chain: Chain
    base_dist: BaseDistribution

    def init(self, key, x=None):
        params, _ = self.chain.init(key, x)
        return params

    def forward(self, params, x):
        return self.chain.forward(params, x)

    def inverse(self, params, z):
        return self.chain.inverse(params, z)

    def log_prob(self, params, x):
        z, logdet = self.forward(params, x)
        return self.base_dist.log_prob(z) + logdet

    def sample_base(self, key, num: int):
        return self.base_dist.sample(key, num)

    def sample(self, params, key, num: int):
        z = self.base_dist.sample(key, num)
        x, _ = self.inverse(params, z)
        return x


@dataclasses.dataclass(frozen=True)
class FastSlowFlowModel(FlowModel):
    """Fast/slow hierarchical flow (reference ``networks.py:87-153``).

    Slow dims [0:num_slow] and fast dims [num_slow:] each get their own
    sub-chain; a final coupling layer masks the slow dims so the slow output
    is exactly invariant to fast-only latent moves (the cosmology fast/slow
    likelihood trick). Params pytree: {'slow':…, 'fast':…, 'combine':…}.
    """

    num_slow: int = 0
    slow_chain: Chain = None
    fast_chain: Chain = None
    combine: AffineCoupling = None

    @property
    def num_fast(self) -> int:
        return self.dim - self.num_slow

    def init(self, key, x=None):
        ks, kf, kc = jax.random.split(key, 3)
        xs = None if x is None else x[:, :self.num_slow]
        xf = None if x is None else x[:, self.num_slow:]
        slow_p, xs = self.slow_chain.init(ks, xs)
        fast_p, xf = self.fast_chain.init(kf, xf)
        xc = None if x is None else jnp.concatenate([xs, xf], axis=1)
        combine_p, _ = self.combine.init(kc, xc)
        return {'slow': slow_p, 'fast': fast_p, 'combine': combine_p}

    def forward(self, params, x):
        slow, ld_s = self.slow_chain.forward(params['slow'],
                                             x[:, :self.num_slow])
        fast, ld_f = self.fast_chain.forward(params['fast'],
                                             x[:, self.num_slow:])
        h = jnp.concatenate([slow, fast], axis=1)
        z, ld_c = self.combine.forward(params['combine'], h)
        return z, ld_s + ld_f + ld_c

    def inverse(self, params, z):
        h, ld_c = self.combine.inverse(params['combine'], z)
        slow, ld_s = self.slow_chain.inverse(params['slow'],
                                             h[:, :self.num_slow])
        fast, ld_f = self.fast_chain.inverse(params['fast'],
                                             h[:, self.num_slow:])
        x = jnp.concatenate([slow, fast], axis=1)
        return x, ld_s + ld_f + ld_c
