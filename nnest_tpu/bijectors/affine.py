"""Affine bijectors: ActNorm, global scale, and RealNVP affine coupling.

TPU-native equivalents of the reference's ``AffineConstantFlow``/``ActNorm``
(``nnest/networks.py:661-705``), ``ScaleLayer`` (``networks.py:312-325``) and
RealNVP ``CouplingLayer`` (``networks.py:248-309``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from nnest_tpu.bijectors.base import Bijector
from nnest_tpu.bijectors.mlp import mlp_init, mlp_apply


@dataclasses.dataclass(frozen=True)
class ActNorm(Bijector):
    """Per-dim learned affine z = x*exp(s) + t with data-dependent init.

    The reference initializes lazily on the first training batch
    (``networks.py:698-705``); here the same statistics-based init happens
    functionally at ``init`` time from the data batch threaded through the
    chain, which is the idiomatic JAX equivalent.
    """

    dim: int

    def init(self, key, x):
        if x is None:
            s = jnp.zeros((self.dim,), jnp.float32)
            t = jnp.zeros((self.dim,), jnp.float32)
        else:
            std = jnp.std(x, axis=0)
            s = -jnp.log(jnp.maximum(std, 1e-6))
            t = -jnp.mean(x * jnp.exp(s), axis=0)
        params = {'s': s, 't': t}
        y = x if x is None else self.forward(params, x)[0]
        return params, y

    def forward(self, params, x):
        z = x * jnp.exp(params['s']) + params['t']
        logdet = jnp.broadcast_to(jnp.sum(params['s']), (x.shape[0],))
        return z, logdet

    def inverse(self, params, z):
        x = (z - params['t']) * jnp.exp(-params['s'])
        logdet = jnp.broadcast_to(-jnp.sum(params['s']), (z.shape[0],))
        return x, logdet


@dataclasses.dataclass(frozen=True)
class ScaleLayer(Bijector):
    """Global learned scalar scale z = x*exp(s) (reference
    ``networks.py:312-325``).

    Note: the reference reports logdet = s regardless of dimension, which is
    only correct for dim=1; we implement the correct logdet = dim*s (documented
    divergence — forward/inverse antisymmetry holds either way).
    """

    dim: int

    def init(self, key, x):
        params = {'s': jnp.zeros((), jnp.float32)}
        y = x if x is None else self.forward(params, x)[0]
        return params, y

    def forward(self, params, x):
        z = x * jnp.exp(params['s'])
        logdet = jnp.broadcast_to(self.dim * params['s'], (x.shape[0],))
        return z, logdet

    def inverse(self, params, z):
        x = z * jnp.exp(-params['s'])
        logdet = jnp.broadcast_to(-self.dim * params['s'], (z.shape[0],))
        return x, logdet


@dataclasses.dataclass(frozen=True)
class AffineCoupling(Bijector):
    """RealNVP affine coupling (reference ``networks.py:248-309``).

    ``mask`` (a tuple of 0/1 floats, static) selects the conditioning dims:
    masked dims pass through unchanged, unmasked dims get
    z = x*exp(log_s) + t with (log_s, t) predicted from the masked dims by
    tanh/relu MLPs. ``translate_only=True`` gives the volume-preserving NICE
    variant.
    """

    dim: int
    hidden: int
    mask: tuple
    num_layers: int = 2
    s_act: str = 'tanh'
    t_act: str = 'relu'
    translate_only: bool = False

    def _sizes(self):
        return [self.dim] + [self.hidden] * (self.num_layers + 1) + [self.dim]

    def init(self, key, x):
        kt, ks = jax.random.split(key)
        params = {'t_net': mlp_init(kt, self._sizes())}
        if not self.translate_only:
            params['s_net'] = mlp_init(ks, self._sizes())
        y = x if x is None else self.forward(params, x)[0]
        return params, y

    def forward(self, params, x):
        mask = jnp.asarray(self.mask, dtype=x.dtype)
        xm = x * mask
        t = mlp_apply(params['t_net'], xm, self.t_act) * (1.0 - mask)
        if self.translate_only:
            return x + t, jnp.zeros(x.shape[0], x.dtype)
        log_s = mlp_apply(params['s_net'], xm, self.s_act) * (1.0 - mask)
        return x * jnp.exp(log_s) + t, jnp.sum(log_s, axis=-1)

    def inverse(self, params, z):
        mask = jnp.asarray(self.mask, dtype=z.dtype)
        zm = z * mask
        t = mlp_apply(params['t_net'], zm, self.t_act) * (1.0 - mask)
        if self.translate_only:
            return z - t, jnp.zeros(z.shape[0], z.dtype)
        log_s = mlp_apply(params['s_net'], zm, self.s_act) * (1.0 - mask)
        return (z - t) * jnp.exp(-log_s), -jnp.sum(log_s, axis=-1)


def alternating_mask(dim: int, start: int = 0) -> tuple:
    """Checkerboard mask (reference ``networks.py:333-334``): dim i gets
    (i + start) % 2."""
    return tuple(float((i + start) % 2) for i in range(dim))
