"""Hot-path spline-flow inverse: packed + gather-free.

Why this exists (measured on TPU v5e, bisected in round 1): a latent-MCMC
scan step's wall time is set by the *loop-carried dependency chain* — the
next z depends on logl(flow⁻¹(z+dz)). Two op classes are catastrophic on
that chain:

  1. dynamic gathers (``take_along_axis`` in the RQS bin lookup,
     ``zs[idx]`` partner selection) — execute as scalar loops on TPU:
     20.5 ms vs 0.31 ms per step at batch 4096x16. Fixed at the source:
     bijectors/rqs.py is gather-free (one-hot bin selection).
  2. per-step ``jnp.linalg.solve`` for the 1x1-conv inverse — repeated
     LU factorization of a loop-invariant matrix. Fixed here:
     ``pack_inverse_consts`` precomputes each conv's dense W⁻¹ and the
     data-independent logdet once per kernel invocation, so XLA hoists it
     out of the scan.

``_inverse_body`` (used by ``LatentKernels._hot_inverse``) reuses the
bijectors' own spline-coupling inverse; only the conv/actnorm steps are
replaced with their packed forms. It matches ``FlowModel.inverse`` to ≤2e-5
(tests/test_fused.py) and reaches ~14M proposal-evals/s in the MCMC scan.

For the single-Mosaic-op Pallas variant see ops/pallas_spline.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nnest_tpu.bijectors.affine import ActNorm
from nnest_tpu.bijectors.conv1x1 import Invertible1x1Conv
from nnest_tpu.bijectors.spline import SplineCoupling

_PRECISION = jax.lax.Precision.HIGHEST


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


def pack_inverse_consts(model, params):
    """Precompute the params-only pieces of the chain inverse: per block
    {actnorm s/t, dense W⁻¹, coupling params}, plus the data-independent
    logdet (actnorm + conv contributions)."""
    bijs = model.chain.bijectors
    blocks = []
    const_logdet = jnp.zeros((), jnp.float32)
    for i in range(0, len(bijs), 3):
        act_p, conv_p, sc_p = params[i], params[i + 1], params[i + 2]
        conv = bijs[i + 1]
        winv = jnp.linalg.inv(conv._assemble(conv_p))
        const_logdet = const_logdet - jnp.sum(act_p['s']) \
            - jnp.sum(jnp.log(jnp.abs(conv_p['S'])))
        blocks.append({'s': act_p['s'], 't': act_p['t'], 'winv': winv,
                       'sc': sc_p})
    return {'blocks': blocks, 'const_logdet': const_logdet}


def _inverse_body(z, packed, model):
    """Full chain inverse on a batch using packed consts (pure jnp)."""
    bijs = model.chain.bijectors
    couplings = [bijs[i + 2] for i in range(0, len(bijs), 3)]
    logdet = jnp.zeros(z.shape[0], jnp.float32)
    for blk, sc in zip(reversed(packed['blocks']), reversed(couplings)):
        z, ld = sc.inverse(blk['sc'], z)
        logdet = logdet + ld
        z = jnp.dot(z, blk['winv'], precision=_PRECISION)
        z = (z - blk['t']) * jnp.exp(-blk['s'])
    return z, logdet + packed['const_logdet']


def fused_inverse_fn(model):
    """inverse(params, z) drop-in with the same signature as model.inverse,
    packing consts on the fly (hoisted by XLA when loop-invariant)."""

    def inverse(params, z):
        return _inverse_body(z, pack_inverse_consts(model, params), model)

    return inverse
