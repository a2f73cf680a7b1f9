"""Settle the Pallas question with a number (VERDICT r1 item 2).

Measures, inside a lax.scan over STEPS iterations at (BATCH, DIM):
  floor    — trivial carry op (the scan dispatch/latency floor)
  xla      — ops/fused_spline._inverse_body (the production gather-free
             XLA formulation, packed loop-invariants)
  pallas   — ops/pallas_spline fused inverse, native Mosaic compile
  pallas_i — same kernel, interpret mode (correctness sentinel, tiny batch)

Usage:  python benchmarks/pallas_inverse_bench.py [--batch 4096] [--steps 100]
Writes one summary line per variant; native-compile failures are caught and
reported (the remote-compile tunnel in some environments cannot compile the
~2k-op fused kernel — that result is itself the datum).
"""

import argparse
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp


def time_scan(step_fn, z0, steps, reps=5):
    def run(z):
        out, _ = jax.lax.scan(lambda c, _: (step_fn(c), 0.0), z,
                              None, length=steps)
        return out

    runj = jax.jit(run)
    t0 = time.perf_counter()
    out = runj(z0)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = runj(z0)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    return dt / steps * 1e3, compile_s  # ms/step


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=4096)
    p.add_argument('--dim', type=int, default=16)
    p.add_argument('--steps', type=int, default=100)
    p.add_argument('--skip_native', action='store_true')
    p.add_argument('--tiles', type=str, default='2048',
                   help='comma-separated pallas batch tiles to try')
    args = p.parse_args()

    from nnest_tpu.flows import build_flow
    from nnest_tpu.ops import fused_spline, pallas_spline

    model = build_flow(args.dim, flow='spline', hidden_dim=16, num_blocks=3)
    x = jnp.asarray(np.random.RandomState(0).normal(
        size=(256, args.dim)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    z0 = jax.random.normal(jax.random.PRNGKey(1), (args.batch, args.dim))

    packed = fused_spline.pack_inverse_consts(model, params)
    consts, meta = pallas_spline.pack_pallas_consts(model, params)

    # correctness cross-check (XLA vs interpret-mode pallas) on a small tile
    zs = z0[:256]
    x_ref, ld_ref = fused_spline._inverse_body(zs, packed, model)
    x_p, ld_p = pallas_spline.pallas_inverse_from_consts(
        consts, meta, zs, tile=256, interpret=True)
    err = float(jnp.max(jnp.abs(x_ref - x_p)))
    errl = float(jnp.max(jnp.abs(ld_ref - ld_p)))
    print('correctness: max|dx|=%.2e max|dlogdet|=%.2e' % (err, errl),
          flush=True)

    ms, cs = time_scan(lambda z: jnp.sin(z) + 0.001 * z, z0, args.steps)
    print('floor   : %.3f ms/step (compile %.1f s)' % (ms, cs), flush=True)

    ms, cs = time_scan(
        lambda z: fused_spline._inverse_body(z, packed, model)[0],
        z0, args.steps)
    print('xla     : %.3f ms/step (compile %.1f s)' % (ms, cs), flush=True)

    if not args.skip_native:
        for tile in [int(t) for t in args.tiles.split(',')]:
            for name, fn in (
                    ('pallas  ', pallas_spline.pallas_inverse_from_consts),
                    ('pallas_b', pallas_spline.pallas_inverse_per_block)):
                try:
                    ms, cs = time_scan(
                        lambda z: fn(consts, meta, z,
                                     tile=min(tile, args.batch))[0],
                        z0, args.steps)
                    print('%s tile %4d: %.3f ms/step (compile %.1f s)'
                          % (name, tile, ms, cs), flush=True)
                except Exception as e:
                    print('%s tile %4d: FAILED %s'
                          % (name, tile, str(e)[:160]), flush=True)


if __name__ == '__main__':
    main()
