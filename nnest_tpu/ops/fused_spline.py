"""Hot-path spline-flow inverse: packed, gather-free, optionally Pallas.

Why this exists (measured on TPU v5e, bisected in round 1): a latent-MCMC
scan step's wall time is set by the *loop-carried dependency chain* — the
next z depends on logl(flow⁻¹(z+dz)). Two op classes are catastrophic on
that chain:

  1. dynamic gathers (``take_along_axis`` in the RQS bin lookup,
     ``zs[idx]`` partner selection) — execute as scalar loops on TPU:
     20.5 ms vs 0.31 ms per step at batch 4096x16;
  2. per-step ``jnp.linalg.solve`` for the 1x1-conv inverse — repeated
     LU factorization of a loop-invariant matrix.

``_inverse_body`` is the production hot path used by
``LatentKernels._hot_inverse``: plain XLA, gather-free one-hot bin
selection, with all params-only preprocessing (dense W⁻¹ per conv, constant
logdets) packed once per kernel invocation by ``pack_inverse_consts`` so it
is hoisted out of the scan. It matches ``FlowModel.inverse`` to ≤2e-5
(tests/test_fused.py).

``make_fused_inverse`` additionally wraps the same body in a single Pallas
kernel (one op per batch tile, everything in VMEM). It is validated in
interpret mode; on current Mosaic it requires avoiding 3D reshapes with
small trailing dims, so the XLA body — which already reaches 13.4M
proposal-evals/s — remains the default.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU memory spaces; absent meaning on CPU interpret mode
    from jax.experimental.pallas import tpu as pltpu
    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

from nnest_tpu.bijectors.affine import ActNorm
from nnest_tpu.bijectors.conv1x1 import Invertible1x1Conv
from nnest_tpu.bijectors.spline import SplineCoupling
from nnest_tpu.bijectors.rqs import (
    DEFAULT_MIN_BIN_WIDTH, DEFAULT_MIN_BIN_HEIGHT, DEFAULT_MIN_DERIVATIVE)


def is_fusable_spline(model) -> bool:
    """True for single-speed spline chains: [ActNorm, Inv1x1Conv,
    SplineCoupling] × blocks (the factory's 'spline' layout)."""
    chain = getattr(model, 'chain', None)
    if chain is None or getattr(model, 'num_slow', 0):
        return False
    bijs = chain.bijectors
    if len(bijs) == 0 or len(bijs) % 3 != 0:
        return False
    for i in range(0, len(bijs), 3):
        if not (isinstance(bijs[i], ActNorm)
                and isinstance(bijs[i + 1], Invertible1x1Conv)
                and isinstance(bijs[i + 2], SplineCoupling)):
            return False
    return True


# --------------------------------------------------------------------- math

def _mlp(x, layers):
    """LeakyReLU(0.2) MLP, activation after all but the last layer."""
    n = len(layers)
    for i, (w, b) in enumerate(layers):
        x = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
        if i < n - 1:
            x = jnp.where(x >= 0, x, 0.2 * x)
    return x


def _cumsum_k(v):
    """Cumulative sum over the last (static K) axis without lax.cumsum."""
    K = v.shape[-1]
    parts = []
    acc = v[..., 0]
    parts.append(acc)
    for k in range(1, K):
        acc = acc + v[..., k]
        parts.append(acc)
    return jnp.stack(parts, axis=-1)


def _softmax_k(v):
    m = jnp.max(v, axis=-1, keepdims=True)
    e = jnp.exp(v - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _rqs_inverse_gatherfree(y, uw, uh, ud, B,
                            min_w=DEFAULT_MIN_BIN_WIDTH,
                            min_h=DEFAULT_MIN_BIN_HEIGHT,
                            min_d=DEFAULT_MIN_DERIVATIVE):
    """RQS inverse with one-hot bin selection (same math as bijectors/rqs.py
    with inverse=True; the double softmax/softplus parameterization is
    applied by the caller)."""
    K = uw.shape[-1]
    inside = (y >= -B) & (y <= B)
    yc = jnp.clip(y, -B, B)

    widths = _softmax_k(uw)
    widths = min_w + (1.0 - min_w * K) * widths
    cumw = 2.0 * B * _cumsum_k(widths) - B
    # exact endpoints
    left_w = jnp.full(cumw.shape[:-1] + (1,), -B, cumw.dtype)
    cumw = jnp.concatenate([left_w, cumw[..., :-1],
                            jnp.full_like(left_w, B)], axis=-1)
    widths = cumw[..., 1:] - cumw[..., :-1]

    heights = _softmax_k(uh)
    heights = min_h + (1.0 - min_h * K) * heights
    cumh = 2.0 * B * _cumsum_k(heights) - B
    left_h = jnp.full(cumh.shape[:-1] + (1,), -B, cumh.dtype)
    cumh = jnp.concatenate([left_h, cumh[..., :-1],
                            jnp.full_like(left_h, B)], axis=-1)
    heights = cumh[..., 1:] - cumh[..., :-1]

    const = math.log(math.exp(1.0 - min_d) - 1.0)
    pad = jnp.full(ud.shape[:-1] + (1,), const, ud.dtype)
    derivs = min_d + jax.nn.softplus(
        jnp.concatenate([pad, ud, pad], axis=-1))

    # one-hot bin index over cumheights (inverse transform); Mosaic iota
    # must be integer-typed
    ge = (yc[..., None] >= cumh).astype(jnp.int32)        # (..., K+1)
    idx = jnp.sum(ge, axis=-1) - 1
    idx = jnp.clip(idx, 0, K - 1)
    kidx = jax.lax.broadcasted_iota(jnp.int32, yc.shape + (K,), yc.ndim)
    onehot = (kidx == idx[..., None]).astype(jnp.float32)

    def sel(v):
        return jnp.sum(v * onehot, axis=-1)

    in_cw = sel(cumw[..., :-1])
    in_w = sel(widths)
    in_ch = sel(cumh[..., :-1])
    in_h = sel(heights)
    in_delta = sel(heights / widths)
    in_d = sel(derivs[..., :-1])
    in_d1 = sel(derivs[..., 1:])
    d_sum = in_d + in_d1 - 2.0 * in_delta

    y_rel = yc - in_ch
    a = in_h * (in_delta - in_d) + y_rel * d_sum
    b = in_h * in_d - y_rel * d_sum
    c = -in_delta * y_rel
    disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
    denom = -b - jnp.sqrt(disc)
    safe = jnp.abs(denom) > 1e-12
    root = jnp.where(safe, 2.0 * c / jnp.where(safe, denom, 1.0), 0.0)
    root = jnp.clip(root, 0.0, 1.0)
    out = root * in_w + in_cw
    t1mt = root * (1.0 - root)
    den2 = in_delta + d_sum * t1mt
    dnum = in_delta ** 2 * (in_d1 * root ** 2 + 2.0 * in_delta * t1mt
                            + in_d * (1.0 - root) ** 2)
    logdet = -(jnp.log(dnum) - 2.0 * jnp.log(den2))

    out = jnp.where(inside, out, y)
    logdet = jnp.where(inside, logdet, 0.0)
    return out, logdet


def _coupling_inverse(z, f1_layers, f2_layers, cut, K, B):
    """NSF-CL inverse (bijectors/spline.py inverse), gather-free RQS."""
    n = z.shape[0]
    lower, upper = z[:, :cut], z[:, cut:]
    up_dim = upper.shape[1]

    def knots(layers, cond, n_dims):
        out = _mlp(cond, layers).reshape(n, n_dims, 3 * K - 1)
        W = 2.0 * B * _softmax_k(out[..., :K])
        H = 2.0 * B * _softmax_k(out[..., K:2 * K])
        Dd = jax.nn.softplus(out[..., 2 * K:])
        return W, H, Dd

    W, H, Dd = knots(f2_layers, upper, cut)
    lower, ld1 = _rqs_inverse_gatherfree(lower, W, H, Dd, B)
    W, H, Dd = knots(f1_layers, lower, up_dim)
    upper, ld2 = _rqs_inverse_gatherfree(upper, W, H, Dd, B)
    logdet = jnp.sum(ld1, axis=-1) + jnp.sum(ld2, axis=-1)
    return jnp.concatenate([lower, upper], axis=1), logdet


# --------------------------------------------------------------- packaging

def pack_inverse_consts(model, params):
    """Flatten spline-chain params into a list of arrays in kernel order,
    precomputing W⁻¹ for each 1x1 conv and the data-independent logdet."""
    bijs = model.chain.bijectors
    arrays = []
    const_logdet = jnp.zeros((), jnp.float32)
    for i in range(0, len(bijs), 3):
        act_p = params[i]
        conv_p = params[i + 1]
        sc_p = params[i + 2]
        conv = bijs[i + 1]
        W = conv._assemble(conv_p)
        Winv = jnp.linalg.inv(W)
        # inverse-direction constant logdets (actnorm: -sum(s); conv:
        # -sum(log|S|))
        const_logdet = const_logdet - jnp.sum(act_p['s']) \
            - jnp.sum(jnp.log(jnp.abs(conv_p['S'])))
        arrays.append(act_p['s'])
        arrays.append(act_p['t'])
        arrays.append(Winv)
        for layer in sc_p['f1']:
            arrays.extend([layer['w'], layer['b']])
        for layer in sc_p['f2']:
            arrays.extend([layer['w'], layer['b']])
    arrays.append(const_logdet.reshape(1))
    return arrays


def _unpack(args, model):
    """Reconstruct the per-block structures from the flat array list."""
    bijs = model.chain.bijectors
    blocks = []
    it = iter(args)
    for i in range(0, len(bijs), 3):
        sc = bijs[i + 2]
        s = next(it)
        t = next(it)
        winv = next(it)
        n_layers = 4  # MLP is 4 linear layers (bijectors/spline.py)
        f1 = [(next(it), next(it)) for _ in range(n_layers)]
        f2 = [(next(it), next(it)) for _ in range(n_layers)]
        blocks.append((s, t, winv, f1, f2, sc))
    const_logdet = next(it)
    return blocks, const_logdet


def _inverse_body(z, args, model):
    """The full chain inverse on a batch tile (pure jnp; runs inside the
    Pallas kernel or standalone for testing)."""
    blocks, const_logdet = _unpack(args, model)
    logdet = jnp.zeros(z.shape[0], jnp.float32)
    for s, t, winv, f1, f2, sc in reversed(blocks):
        cut = sc.half_dim if sc.even else sc.half_dim + 1
        z, ld = _coupling_inverse(z, f1, f2, cut, sc.num_bins,
                                  sc.tail_bound)
        logdet = logdet + ld
        z = jnp.dot(z, winv, preferred_element_type=jnp.float32)
        z = (z - t) * jnp.exp(-s)
    logdet = logdet + const_logdet[0]
    return z, logdet


# ------------------------------------------------------------- pallas call

def make_fused_inverse(model, tile=1024, interpret=False):
    """Build fused_inverse(consts, z) -> (x, logdet) where consts =
    pack_inverse_consts(model, params). One Pallas kernel per batch tile."""

    def kernel(*refs):
        z_ref = refs[0]
        out_x = refs[-2]
        out_ld = refs[-1]
        args = [r[:] for r in refs[1:-2]]
        x, ld = _inverse_body(z_ref[:], args, model)
        out_x[:] = x
        out_ld[:] = ld[:, None]

    def fused(consts, z):
        n, d = z.shape
        tb = min(tile, n)
        pad = (-n) % tb
        if pad:
            z = jnp.concatenate([z, z[:pad]], axis=0)
        np_ = z.shape[0]
        grid = (np_ // tb,)

        in_specs = [pl.BlockSpec((tb, d), lambda i: (i, 0))]
        for a in consts:
            shape = a.shape if a.ndim > 0 else (1,)
            nd = len(shape)
            in_specs.append(pl.BlockSpec(
                shape, (lambda nd_: lambda i: (0,) * nd_)(nd)))
        out_specs = [pl.BlockSpec((tb, d), lambda i: (i, 0)),
                     pl.BlockSpec((tb, 1), lambda i: (i, 0))]
        out_shape = [jax.ShapeDtypeStruct((np_, d), jnp.float32),
                     jax.ShapeDtypeStruct((np_, 1), jnp.float32)]
        consts2 = [a.reshape(1) if a.ndim == 0 else a for a in consts]
        x, ld = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(z, *consts2)
        x = x[:n]
        ld = ld[:n, 0]
        return x, ld

    return fused


def fused_inverse_fn(model, interpret=False, tile=1024):
    """inverse(params, z) drop-in with the same signature as model.inverse,
    packing consts on the fly (cheap; jit caches it per params)."""
    fused = make_fused_inverse(model, tile=tile, interpret=interpret)

    def inverse(params, z):
        consts = pack_inverse_consts(model, params)
        return fused(consts, z)

    return inverse
