"""Absolute-performance anchor: roofline/MFU for the two hot programs.

The bench.py speedups say nothing about headroom against the silicon, so
this script measures, for (A) the constrained-MCMC scan step at the
production nested shape (4096 chains x 16-D, the bench.py workload C) and
(B) the flow-training step (batch 100 over 1000x16, the trainer default),

  - wall clock per step (median of reps, one dispatch per rep),
  - HLO-level FLOPs and bytes accessed from XLA's cost analysis of the
    compiled program (``compiled.cost_analysis()``; scan bodies are
    counted per-iteration by the TPU analysis — validated below by
    checking FLOPs scale ~linearly in mcmc_steps),
  - achieved FLOP/s and bytes/s against the chip's peaks, and the
    binding constraint (compute / bandwidth / dispatch-latency).

Run ON THE REAL TPU (no JAX_PLATFORMS override):

    python benchmarks/roofline.py          # one JSON line per workload

v5e single-chip peaks used (public spec): 197 TFLOP/s bf16 on the MXU,
819 GB/s HBM. f32 matmuls (Precision.HIGHEST, which the accept-ratio
paths require — see CLAUDE.md rule 2) run as multi-pass bf16 and cannot
reach the bf16 peak; the MFU numbers here are against the bf16 ceiling,
i.e. deliberately conservative.

Results land in BENCHMARKS.md ("Roofline" section).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

PEAK_FLOPS = 197e12      # v5e bf16
PEAK_BYTES = 819e9       # v5e HBM bandwidth

X_DIM = 16
NESTED_CHAINS = 4096
NESTED_STEPS = 80
TRAIN_N = 1000
TRAIN_BATCH = 100


def _cost(compiled):
    try:
        c = compiled.cost_analysis()
        c = c[0] if isinstance(c, (list, tuple)) else c
        return (float(c.get('flops', -1.0)),
                float(c.get('bytes accessed', -1.0)))
    except Exception:
        return -1.0, -1.0


def _report(name, dt, flops, bytes_, extra=None):
    rec = {
        'workload': name,
        'wall_ms': round(dt * 1e3, 3),
        'gflops': None if flops < 0 else round(flops / 1e9, 3),
        'gbytes': None if bytes_ < 0 else round(bytes_ / 1e9, 4),
        'achieved_tflops': None if flops < 0 else round(flops / dt / 1e12,
                                                        3),
        'achieved_gbs': None if bytes_ < 0 else round(bytes_ / dt / 1e9,
                                                      2),
        'mfu_pct': None if flops < 0 else round(100 * flops / dt
                                                / PEAK_FLOPS, 2),
        'hbm_pct': None if bytes_ < 0 else round(100 * bytes_ / dt
                                                 / PEAK_BYTES, 2),
    }
    if rec['mfu_pct'] is not None:
        t_compute = flops / PEAK_FLOPS
        t_memory = bytes_ / PEAK_BYTES
        floor = max(t_compute, t_memory)
        rec['bound'] = ('compute' if t_compute > t_memory else 'memory')
        # if the measured wall dwarfs both rooflines, the program is
        # latency/occupancy bound (small tensors, serial scan carry)
        if dt > 5 * floor:
            rec['bound'] = 'latency (wall %.0fx the %s roofline)' % (
                dt / max(floor, 1e-12), rec['bound'])
        rec['roofline_floor_ms'] = round(floor * 1e3, 3)
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    return rec


def _time_compiled(fn_compiled, args_list, payload):
    import jax
    out = fn_compiled(*args_list[0])
    jax.block_until_ready(out[payload] if payload else out)
    times = []
    for a in args_list[1:]:
        t0 = time.perf_counter()
        out = fn_compiled(*a)
        jax.block_until_ready(out[payload] if payload else out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def roofline_nested_mcmc():
    import jax
    import jax.numpy as jnp
    from nnest_tpu.flows import build_flow
    from nnest_tpu.samplers.kernels import LatentKernels

    model = build_flow(X_DIM, flow='spline')
    rng = np.random.RandomState(0)
    x_init = jnp.asarray(rng.normal(size=(256, X_DIM)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x_init)

    def like_fn(u):
        x = 5.0 * u
        logl = -jnp.sum(100.0 * (x[:, 1:] - x[:, :-1] ** 2) ** 2
                        + (1.0 - x[:, :-1]) ** 2, axis=1)
        return logl, jnp.zeros((u.shape[0], 0), jnp.float32)

    def prior_fn(u):
        inside = jnp.all(jnp.abs(u) <= 1.0, axis=-1)
        return jnp.where(inside, 0.0, -jnp.inf)

    kern = LatentKernels(model, like_fn, prior_fn)

    @jax.jit
    def _setup(params, key):
        z0 = 0.1 * jax.random.normal(key, (NESTED_CHAINS, X_DIM))
        x0, _ = model.inverse(params, z0)
        logl0, derived0 = like_fn(x0)
        return z0, logl0, derived0

    z0, logl0, derived0 = _setup(params, jax.random.PRNGKey(1))
    lstar = np.float32(np.quantile(np.asarray(jax.device_get(logl0)), 0.1))

    mu = np.zeros((X_DIM,), np.float32)
    var = np.ones((X_DIM,), np.float32)

    recs = []
    for steps in (8, NESTED_STEPS):
        def run(params, key, z0, logl0, derived0, lp, steps=steps):
            return kern._mcmc_impl(
                params, key, z0, logl0, derived0, lp,
                lstar, np.float32(0.3), mu, var,
                mcmc_steps=steps, constrained=True,
                dynamic_step_size=True, prior_volume_steps=1,
                collect_chains=False, own_moments=True)

        jfn = jax.jit(run)
        args = (params, jax.random.PRNGKey(2), z0, logl0, derived0,
                jnp.zeros(NESTED_CHAINS))
        compiled = jfn.lower(*args).compile()
        flops, bytes_ = _cost(compiled)
        alist = [(params, jax.random.PRNGKey(3 + i), z0, logl0,
                  derived0, jnp.zeros(NESTED_CHAINS)) for i in range(7)]
        dt = _time_compiled(compiled, alist, 'final_x')
        recs.append(_report(
            'nested_mcmc_%dx%d_steps%d' % (NESTED_CHAINS, X_DIM, steps),
            dt, flops, bytes_,
            extra={'per_step_us': round(dt / steps * 1e6, 1)}))
    if recs[0]['gflops'] and recs[1]['gflops']:
        # scan-body accounting check: flops should scale ~steps
        ratio = recs[1]['gflops'] / recs[0]['gflops']
        print(json.dumps({'scan_flops_scaling': round(ratio, 2),
                          'expected': NESTED_STEPS / 8}), flush=True)
    return recs


def roofline_train_step():
    import jax
    import jax.numpy as jnp
    import optax
    from nnest_tpu.flows import build_flow

    model = build_flow(X_DIM, flow='spline')
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.normal(size=(TRAIN_N, X_DIM)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), data[:256])
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def step(params, opt_state, batch):
        def loss_fn(p):
            return -jnp.mean(model.log_prob(p, batch))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jfn = jax.jit(step)
    batch = data[:TRAIN_BATCH]
    compiled = jfn.lower(params, opt_state, batch).compile()
    flops, bytes_ = _cost(compiled)

    out = compiled(params, opt_state, batch)
    jax.block_until_ready(out[2])
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        out = compiled(out[0], out[1], batch)
        jax.block_until_ready(out[2])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    recs = [_report('train_step_b%d_%dD' % (TRAIN_BATCH, X_DIM), dt,
                    flops, bytes_)]

    # the same step at an MXU-friendly batch: how much utilization is on
    # the table if a user raises batch_size
    big = 4096
    datab = jnp.asarray(rng.normal(size=(big, X_DIM)), jnp.float32)
    compiled_b = jfn.lower(params, opt_state, datab).compile()
    flops_b, bytes_b = _cost(compiled_b)
    out = compiled_b(params, opt_state, datab)
    jax.block_until_ready(out[2])
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        out = compiled_b(out[0], out[1], datab)
        jax.block_until_ready(out[2])
        times.append(time.perf_counter() - t0)
    recs.append(_report('train_step_b%d_%dD' % (big, X_DIM),
                        float(np.median(times)), flops_b, bytes_b))
    return recs


def main():
    import jax
    print(json.dumps({'backend': jax.default_backend(),
                      'device': str(jax.devices()[0])}), flush=True)
    roofline_nested_mcmc()
    roofline_train_step()


if __name__ == '__main__':
    main()
