"""Pallas TPU kernel: whole spline-flow inverse as ONE fused Mosaic op.

Mosaic (the Pallas TPU compiler) rejects 3D reshapes with small trailing
dims, so the (batch, dims, K) RQS tensors of ops/fused_spline.py cannot
lower directly. This module reformulates the entire chain inverse in 2D
with the K/bin structure encoded in *segment matrices* (tiny host-built 0/1
matrices applied with MXU matmuls):

- per-dim → per-bin replication, segmented softmax/cumsum, one-hot bin
  selection, and left/right-edge selection are all matmuls against constant
  (n·K × n·(K+1))-sized matrices;
- the conditioner MLP's last layer is column-permuted host-side so W/H/D
  land in segment-contiguous 2D layouts;
- everything lives in VMEM for a batch tile; one ``pallas_call`` covers
  [ActNorm⁻¹ ∘ 1x1Conv⁻¹ ∘ NSF-CL⁻¹] × blocks + logdet.

Status: MEASURED, and demoted to documented experiment. Both the fused
kernel and the per-block variant compile natively on TPU v5e (tile <= 512
fused / <= 1024 per-block; tile 2048 exceeds the 16 MB scoped-VMEM limit)
and are numerically correct, but in the 4096x16 MCMC scan they run
1.20-1.37 ms/step vs 0.54 ms/step for the plain-XLA gather-free body
(ops/fused_spline._inverse_body; scan floor 0.37 ms/step, same session —
benchmarks/pallas_inverse_bench.py). The segment-matmul formulation that
makes the kernel Mosaic-lowerable (bin selection / segmented softmax /
cumsum as 0/1-matrix MXU matmuls) does strictly more arithmetic than the
fused vector code XLA emits for the same math, and at dim<=50 the workload
is latency- not bandwidth-bound, so kernel fusion buys nothing. The XLA
body is the production default; this module remains as the measured
experiment and a template for genuinely bandwidth-bound future kernels.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from nnest_tpu.bijectors.rqs import (
    DEFAULT_MIN_BIN_WIDTH, DEFAULT_MIN_BIN_HEIGHT, DEFAULT_MIN_DERIVATIVE)
from nnest_tpu.ops.fused_spline import is_fusable_spline

_PREC = jax.lax.Precision.HIGHEST


def build_seg_consts(n: int, K: int, B: float,
                     min_d: float = DEFAULT_MIN_DERIVATIVE):
    """Constant segment matrices for an n-dim, K-bin RQS half-transform.
    All 2D float32; see module docstring."""
    E = K + 1
    nK, nE = n * K, n * E
    R = np.zeros((n, nK), np.float32)       # per-dim → per-bin replicate
    RE = np.zeros((n, nE), np.float32)      # per-dim → per-edge replicate
    S = np.zeros((nK, n), np.float32)       # per-bin segment sum
    CUM = np.zeros((nK, nE), np.float32)    # widths → cumulative edges
    G = np.zeros((nE, nK), np.float32)      # edge-comparisons → onehot bins
    LEFT = np.zeros((nE, nK), np.float32)   # edge value at bin's left knot
    RIGHT = np.zeros((nE, nK), np.float32)  # edge value at bin's right knot
    PD = np.zeros((n * (K - 1), nE), np.float32)  # interior derivs → edges
    for s in range(n):
        for k in range(K):
            R[s, s * K + k] = 1.0
            S[s * K + k, s] = 1.0
            LEFT[s * E + k, s * K + k] = 1.0
            RIGHT[s * E + k + 1, s * K + k] = 1.0
            G[s * E + k, s * K + k] = 1.0
            G[s * E + k + 1, s * K + k] = -1.0
            for e in range(E):
                if k < e:
                    CUM[s * K + k, s * E + e] = 1.0
        for e in range(E):
            RE[s, s * E + e] = 1.0
        for k in range(K - 1):
            PD[s * (K - 1) + k, s * E + k + 1] = 1.0

    const_raw = math.log(math.exp(1.0 - min_d) - 1.0)
    pd_const = np.zeros(nE, np.float32)
    inner_mask = np.ones(nE, np.float32)
    endpoint = np.zeros(nE, np.float32)
    eps_last = np.zeros(nE, np.float32)
    for s in range(n):
        pd_const[s * E + 0] = const_raw
        pd_const[s * E + K] = const_raw
        inner_mask[s * E + 0] = 0.0
        inner_mask[s * E + K] = 0.0
        endpoint[s * E + 0] = -B
        endpoint[s * E + K] = B
        eps_last[s * E + K] = 1e-6

    # DIFF: edges → per-bin widths (edge[k+1] - edge[k])
    DIFF = (RIGHT - LEFT).astype(np.float32)
    return dict(R=R, RE=RE, S=S, CUM=CUM, G=G, LEFT=LEFT, RIGHT=RIGHT,
                PD=PD, pd_const=pd_const, inner_mask=inner_mask,
                endpoint=endpoint, eps_last=eps_last, DIFF=DIFF)


def _seg_softmax(v, S, R):
    """Segmented softmax over K-lane groups of a (TB, nK) array. The row
    max is constant within every segment, so it is a valid stabilizer."""
    m = jnp.max(v, axis=-1, keepdims=True)
    e = jnp.exp(v - m)
    den = jnp.dot(jnp.dot(e, S, precision=_PREC), R, precision=_PREC)
    return e / den


def _rqs_inverse_2d(y, uw, uh, ud_sp, c, K, B,
                    min_w=DEFAULT_MIN_BIN_WIDTH,
                    min_h=DEFAULT_MIN_BIN_HEIGHT,
                    min_d=DEFAULT_MIN_DERIVATIVE):
    """RQS inverse on (TB, n) inputs with (TB, nK)-layout knot params.
    ``uw``/``uh`` are the *pre-normalized* 2B·softmax outputs (the
    reference's NSF_CL quirk) in segment layout; ``ud_sp`` is
    softplus(raw derivatives) in (TB, n(K-1)) layout."""
    dot = lambda a, b: jnp.dot(a, b, precision=_PREC)
    inside = (y >= -B) & (y <= B)
    yb = jnp.clip(y, -B, B)

    w = _seg_softmax(uw, c['S'], c['R'])
    w = min_w + (1.0 - min_w * K) * w
    edges_w = 2.0 * B * dot(w, c['CUM']) - B
    edges_w = edges_w * c['inner_mask'] + c['endpoint']
    widths = dot(edges_w, c['DIFF'])

    h = _seg_softmax(uh, c['S'], c['R'])
    h = min_h + (1.0 - min_h * K) * h
    edges_h = 2.0 * B * dot(h, c['CUM']) - B
    edges_h = edges_h * c['inner_mask'] + c['endpoint']
    heights = dot(edges_h, c['DIFF'])

    derivs = min_d + jax.nn.softplus(dot(ud_sp, c['PD']) + c['pd_const'])

    # one-hot bin selection over height edges (inverse direction)
    y_e = dot(yb, c['RE'])
    ge = (y_e >= edges_h + c['eps_last']).astype(jnp.float32)
    onehot = dot(ge, c['G'])

    def sel(v_nk):
        return dot(v_nk * onehot, c['S'])

    in_cw = sel(dot(edges_w, c['LEFT']))
    in_w = sel(widths)
    in_ch = sel(dot(edges_h, c['LEFT']))
    in_h = sel(heights)
    in_delta = sel(heights / widths)
    in_d = sel(dot(derivs, c['LEFT']))
    in_d1 = sel(dot(derivs, c['RIGHT']))
    d_sum = in_d + in_d1 - 2.0 * in_delta

    y_rel = yb - in_ch
    a = in_h * (in_delta - in_d) + y_rel * d_sum
    b = in_h * in_d - y_rel * d_sum
    cq = -in_delta * y_rel
    disc = jnp.maximum(b * b - 4.0 * a * cq, 0.0)
    denom = -b - jnp.sqrt(disc)
    safe = jnp.abs(denom) > 1e-12
    root = jnp.where(safe, 2.0 * cq / jnp.where(safe, denom, 1.0), 0.0)
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


def _reorg_last_layer(w, b, n_dims, K):
    """Column-permute the conditioner's last linear layer so its outputs are
    (uw | uh | ud) in segment-contiguous layout. Static-index selection on
    possibly-traced arrays (runs outside the kernel / scan)."""
    per = 3 * K - 1
    idx_w, idx_h, idx_d = [], [], []
    for j in range(n_dims):
        base = j * per
        idx_w.extend(range(base, base + K))
        idx_h.extend(range(base + K, base + 2 * K))
        idx_d.extend(range(base + 2 * K, base + 3 * K - 1))
    iw = np.asarray(idx_w)
    ih = np.asarray(idx_h)
    idd = np.asarray(idx_d)
    w = jnp.asarray(w)
    b = jnp.asarray(b)
    return (w[:, iw], b[iw], w[:, ih], b[ih], w[:, idd], b[idd])


def pack_pallas_consts(model, params):
    """Flatten params + segment matrices into a kernel-argument list, with a
    parallel ``meta`` describing the static structure."""
    bijs = model.chain.bijectors
    arrays = []
    meta = {'blocks': [], 'dim': model.dim}
    seg_cache = {}
    const_logdet = jnp.zeros((), jnp.float32)

    def add(a):
        arrays.append(jnp.asarray(a, jnp.float32))
        return len(arrays) - 1

    def seg_idx(n, K, B):
        key = (n, K, float(B))
        if key not in seg_cache:
            c = build_seg_consts(n, K, B)
            seg_cache[key] = {k: add(v) for k, v in c.items()}
        return seg_cache[key]

    for i in range(0, len(bijs), 3):
        act_p, conv_p, sc_p = params[i], params[i + 1], params[i + 2]
        conv = bijs[i + 1]
        sc = bijs[i + 2]
        W = conv._assemble(conv_p)
        const_logdet = const_logdet - jnp.sum(act_p['s']) \
            - jnp.sum(jnp.log(jnp.abs(conv_p['S'])))
        cut = sc.half_dim if sc.even else sc.half_dim + 1
        up = sc.dim - cut

        def pack_mlp(layers, n_dims):
            hidden = [(add(l['w']), add(l['b'])) for l in layers[:-1]]
            parts = _reorg_last_layer(layers[-1]['w'], layers[-1]['b'],
                                      n_dims, sc.num_bins)
            last = tuple(add(p) for p in parts)
            return {'hidden': hidden, 'last': last}

        block = {
            's': add(act_p['s']), 't': add(act_p['t']),
            'winv': add(jnp.linalg.inv(W)),
            'f1': pack_mlp(sc_p['f1'], up),    # conditions on lower → upper
            'f2': pack_mlp(sc_p['f2'], cut),   # conditions on upper → lower
            'seg_lower': seg_idx(cut, sc.num_bins, sc.tail_bound),
            'seg_upper': seg_idx(up, sc.num_bins, sc.tail_bound),
            'cut': cut, 'K': sc.num_bins, 'B': sc.tail_bound,
        }
        meta['blocks'].append(block)
    meta['const_logdet'] = add(const_logdet.reshape(1))
    return arrays, meta


def _mlp_2d(x, hidden, last, args):
    for wi, bi in hidden:
        x = jnp.dot(x, args[wi], precision=_PREC) + args[bi]
        x = jnp.where(x >= 0, x, 0.2 * x)
    ww, bw, wh, bh, wd, bd = last
    uw = jnp.dot(x, args[ww], precision=_PREC) + args[bw]
    uh = jnp.dot(x, args[wh], precision=_PREC) + args[bh]
    ud = jnp.dot(x, args[wd], precision=_PREC) + args[bd]
    return uw, uh, ud


def _half_inverse(y, cond, mlp, seg, args, K, B):
    """Invert one RQS half-transform conditioned on ``cond``."""
    uw, uh, ud = _mlp_2d(cond, mlp['hidden'], mlp['last'], args)
    c = {k: args[v] for k, v in seg.items()}
    # reference pre-normalization quirk: 2B*softmax, softplus
    uw = 2.0 * B * _seg_softmax(uw, c['S'], c['R'])
    uh = 2.0 * B * _seg_softmax(uh, c['S'], c['R'])
    ud_sp = jax.nn.softplus(ud)
    return _rqs_inverse_2d(y, uw, uh, ud_sp, c, K, B)


def inverse_body_2d(z, args, meta, include_const=True):
    """Full chain inverse on a batch tile; 2D ops only (Mosaic-safe)."""
    logdet = jnp.zeros((z.shape[0], 1), jnp.float32)
    for block in reversed(meta['blocks']):
        cut, K, B = block['cut'], block['K'], block['B']
        lower, upper = z[:, :cut], z[:, cut:]
        # NSF-CL inverse: f2(upper) → invert lower; f1(lower) → invert upper
        lower, ld1 = _half_inverse(lower, upper, block['f2'],
                                   block['seg_lower'], args, K, B)
        upper, ld2 = _half_inverse(upper, lower, block['f1'],
                                   block['seg_upper'], args, K, B)
        logdet = logdet + jnp.sum(ld1, axis=-1, keepdims=True) \
            + jnp.sum(ld2, axis=-1, keepdims=True)
        z = jnp.concatenate([lower, upper], axis=1)
        z = jnp.dot(z, args[block['winv']], precision=_PREC)
        z = (z - args[block['t']]) * jnp.exp(-args[block['s']])
    if include_const:
        logdet = logdet + args[meta['const_logdet']][0]
    return z, logdet


def make_pallas_inverse(model, tile: int = 2048, interpret: bool = False):
    """Build inverse(params, z) -> (x, logdet) running the whole chain
    inverse as one Pallas kernel per batch tile. For use inside scans,
    prefer ``pallas_inverse_from_consts`` with consts packed once outside
    the loop (see LatentKernels._hot_inverse)."""
    if not is_fusable_spline(model):
        raise ValueError('pallas inverse requires a single-speed spline flow')

    def inverse(params, z):
        consts, meta = pack_pallas_consts(model, params)
        return pallas_inverse_from_consts(consts, meta, z, tile=tile,
                                          interpret=interpret)

    return inverse


def _run_tiled(body, consts, meta, z, tile, interpret):
    """Common pallas_call plumbing: tile the batch, broadcast the consts."""

    def kernel(*refs):
        z_ref = refs[0]
        out_x, out_ld = refs[-2], refs[-1]
        args = [r[:] for r in refs[1:-2]]
        x, ld = body(z_ref[:], args)
        out_x[:] = x
        out_ld[:] = ld

    n, d = z.shape
    tb = min(tile, n)
    pad = (-n) % tb
    if pad:
        z = jnp.concatenate([z, z[:pad]], axis=0)
    np_ = z.shape[0]

    in_specs = [pl.BlockSpec((tb, d), lambda i: (i, 0))]
    for a in consts:
        nd = a.ndim
        in_specs.append(pl.BlockSpec(a.shape,
                                     (lambda m: lambda i: (0,) * m)(nd)))
    x, ld = pl.pallas_call(
        kernel,
        grid=(np_ // tb,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((tb, d), lambda i: (i, 0)),
                   pl.BlockSpec((tb, 1), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((np_, d), jnp.float32),
                   jax.ShapeDtypeStruct((np_, 1), jnp.float32)],
        interpret=interpret,
    )(z, *consts)
    return x[:n], ld[:n, 0]


def pallas_inverse_from_consts(consts, meta, z, tile: int = 2048,
                               interpret: bool = False):
    """Run the whole chain inverse as ONE fused kernel."""
    return _run_tiled(
        lambda zt, args: inverse_body_2d(zt, args, meta),
        consts, meta, z, tile, interpret)


def pallas_inverse_per_block(consts, meta, z, tile: int = 2048,
                             interpret: bool = False):
    """Run the chain inverse as one Pallas kernel PER BLOCK (one
    [ActNorm⁻¹ ∘ 1x1Conv⁻¹ ∘ NSF-CL⁻¹] unit each), chained in XLA. ~1/B of
    the fused kernel's op count per compile unit — for environments whose
    (remote) compile budget rejects the fully fused kernel."""
    n = z.shape[0]
    logdet = jnp.zeros((n,), jnp.float32)
    for block in reversed(meta['blocks']):
        sub = {'blocks': [block], 'dim': meta['dim']}
        z, ld = _run_tiled(
            lambda zt, args, sub=sub: inverse_body_2d(
                zt, args, sub, include_const=False),
            consts, meta, z, tile, interpret)
        logdet = logdet + ld
    return z, logdet + consts[meta['const_logdet']][0]
