"""Benchmark: nnest_tpu throughput vs the PyTorch CPU reference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "x", "vs_baseline": N}

Workloads (each matches a reference measurement made on this machine's CPU
with the reference v0.4.2, torch CPU, getdist/emcee stubbed, 2026-08-16):

  A) Latent-space Metropolis, full-MH, 16-D Rosenbrock, 3-block spline
     flow: proposal evaluations/s. Reference ``Sampler._mcmc_sample``
     (nnest/sampler.py:372-416), 64 chains x 100 steps.
       REF_MCMC_EVALS_PER_SEC = 2648.6
  B) Flow training: epochs/s on 1000x16 samples, batch 100 (reference
     ``Trainer.train``, nnest/trainer.py:134).
       REF_TRAIN_EPOCHS_PER_SEC = 3.06
  C) Constrained (nested-mode) Metropolis — the flagship nested-sampling
     kernel: hard loglstar bound, endpoint-only returns, device ESS stats
     (reference ``Sampler._mcmc_sample`` constrained branch,
     nnest/sampler.py:299-370; 64 chains x 100 steps, permissive bound so
     every prior/Jacobian-accepted lane evaluates the likelihood).
       REF_NESTED_EVALS_PER_SEC = 2357.2
  D) Rejection-flow sampling: constrained candidates produced per second
     with a cached envelope (reference ``Sampler._rejection_flow_sample``,
     nnest/sampler.py:545-607 — a one-candidate-at-a-time host loop). The
     trial batch is 65,536 — the ceiling NestedSampler's adaptive
     power-of-two trial ladder reaches in production once shell acceptance
     decays (samplers/nested.py, rejection_max_trials). Two bounds:
     - permissive (loglstar=-1e9): every Jacobian+prior-accepted trial is
       a candidate — the kernel's best case.
       REF_REJECTION_CAND_PER_SEC = 112.2
     - realistic shell: loglstar at the 90th percentile of each side's own
       flow-accepted candidate log-likelihoods, i.e. ~10% shell acceptance
       relative to the envelope — what the sampler actually experiences
       once the shell shrinks. Reference measured with the same protocol
       on this machine (torch CPU, 2026-08-17, benchmarks/ref_shell_bench.py).
       REF_REJECTION_SHELL_CAND_PER_SEC: see constant below.

  E) Latent ensemble stretch move (the EnsembleSampler engine): proposal
     evaluations/s, full-MH latent stretch on the same 16-D flow. The
     reference hands this to emcee, whose default (non-vectorized)
     stretch calls ``transformed_loglike`` one walker at a time, each
     paying a torch flow inverse (``nnest/sampler.py:674-689``) —
     measured same-protocol on this machine via
     benchmarks/ref_ensemble_bench.py (2026-08-20, torch CPU 4 threads,
     best of 4 runs 138.4, range 86-138 under load — the denominator is
     the reference-favoring best).
       REF_ENSEMBLE_EVALS_PER_SEC = 138.4
  F) Constrained latent SLICE kernel (the 'slice' strategy, a capability
     the reference lacks): within-shell likelihood evaluations/s under
     the kernel's sequential-accounting ncall rule — the same currency
     as workload C, against the same denominator: the reference's only
     within-shell engine is its constrained Metropolis
     (``nnest/sampler.py:299-370``), so REF_NESTED_EVALS_PER_SEC is the
     price a reference user pays for the job slice does here.

The TPU side runs the same statistical workloads batched wide (the point of
the TPU-native design: one chip retires the whole chain block per fused
scan step). The reported value is the geometric mean of the seven speedups.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

REF_MCMC_EVALS_PER_SEC = 2648.6
REF_TRAIN_EPOCHS_PER_SEC = 3.06
REF_NESTED_EVALS_PER_SEC = 2357.2
REF_REJECTION_CAND_PER_SEC = 112.2
# Measured 2026-08-19 (torch CPU, 4 threads, benchmarks/ref_shell_bench.py
# --min_candidates 1000): the reference produced 1220 candidates in
# 900.2 s at its own 90th-pct shell (10441 likelihood calls -> ~12%
# shell acceptance) -> 1.355 +/- 0.042 cand/s (bootstrap std). This
# supersedes the thin 2026-08-17 measurement (39 candidates, 0.627
# cand/s). Same-harness permissive re-measurement gave 11.3 cand/s, so
# the historical 112.2 used for workload D remains a deliberately
# conservative (reference-favoring) ceiling.
REF_REJECTION_SHELL_CAND_PER_SEC = 1.355
REF_ENSEMBLE_EVALS_PER_SEC = 138.4

X_DIM = 16
MCMC_CHAINS = 16384
MCMC_STEPS = 100
NESTED_CHAINS = 4096
NESTED_STEPS = 80          # 5 * x_dim, the nested default
SLICE_CHAINS = 4096
SLICE_STEPS = 32           # 2 * x_dim, the slice default
ENSEMBLE_WALKERS = 4096
ENSEMBLE_STEPS = 100
REJECTION_TRIALS = 65536
TRAIN_N = 1000
TRAIN_EPOCHS = 50


def _setup():
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
    return model, params, kern, like_fn


def _time_reps(fn, warm_args, rep_args, payload_key):
    out = fn(warm_args)
    jax.block_until_ready(out[payload_key])
    t0 = time.perf_counter()
    for a in rep_args:
        out = fn(a)
        jax.block_until_ready(out[payload_key])
    return (time.perf_counter() - t0) / len(rep_args)


def bench_mcmc(setup):
    model, params, kern, like_fn = setup
    z0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                 (MCMC_CHAINS, X_DIM))
    x0, _ = model.inverse(params, z0)
    logl0, derived0 = like_fn(x0)

    def run(key):
        return kern.mcmc(params, key, z0, logl0, derived0,
                         jnp.zeros(MCMC_CHAINS), loglstar=None,
                         step_size=0.3, mcmc_steps=MCMC_STEPS,
                         dynamic_step_size=True)

    dt = _time_reps(run, jax.random.PRNGKey(2),
                    [jax.random.PRNGKey(3 + i) for i in range(3)],
                    'samples')
    return MCMC_CHAINS * MCMC_STEPS / dt


def bench_nested_kernel(setup):
    """Constrained-mode endpoint-only Metropolis at a realistic nested
    config (the kernel behind NestedSampler's mcmc strategy)."""
    model, params, kern, like_fn = setup
    z0 = 0.1 * jax.random.normal(jax.random.PRNGKey(11),
                                 (NESTED_CHAINS, X_DIM))
    x0, _ = model.inverse(params, z0)
    logl0, derived0 = like_fn(x0)

    def run(key):
        return kern.mcmc(params, key, z0, logl0, derived0,
                         jnp.zeros(NESTED_CHAINS), loglstar=-1e9,
                         step_size=0.3, mcmc_steps=NESTED_STEPS,
                         dynamic_step_size=True, collect_chains=False)

    dt = _time_reps(run, jax.random.PRNGKey(12),
                    [jax.random.PRNGKey(13 + i) for i in range(3)],
                    'final_x')
    return NESTED_CHAINS * NESTED_STEPS / dt


def bench_slice_kernel(setup):
    """Constrained latent slice kernel: sequential-accounting likelihood
    evaluations/s (the kernel's ncall rule — what a sequential
    implementation of the same trajectory would pay), permissive bound
    so every geometry-passing probe evaluates, mirroring workload C's
    protocol."""
    model, params, kern, like_fn = setup
    z0 = 0.1 * jax.random.normal(jax.random.PRNGKey(31),
                                 (SLICE_CHAINS, X_DIM))
    x0, _ = model.inverse(params, z0)
    logl0, derived0 = like_fn(x0)

    def run(key):
        return kern.slice_(params, key, z0, logl0, derived0,
                           loglstar=-1e9, width=1.0,
                           slice_steps=SLICE_STEPS)

    out = run(jax.random.PRNGKey(32))
    jax.block_until_ready(out['final_x'])
    n_evals = 0
    t0 = time.perf_counter()
    for i in range(3):
        out = run(jax.random.PRNGKey(33 + i))
        n_evals += int(out['ncall'])   # pull forces completion
    return n_evals / (time.perf_counter() - t0)


def bench_ensemble_stretch(setup):
    """Latent ensemble stretch move (EnsembleSampler engine): proposal
    evaluations/s, full-MH, red-black half ensembles — the statistical
    workload emcee performs for the reference one walker at a time."""
    model, params, kern, like_fn = setup
    z0 = 0.1 * jax.random.normal(jax.random.PRNGKey(41),
                                 (ENSEMBLE_WALKERS, X_DIM))

    def run(key):
        return kern.stretch(params, key, z0, mcmc_steps=ENSEMBLE_STEPS)

    dt = _time_reps(run, jax.random.PRNGKey(42),
                    [jax.random.PRNGKey(43 + i) for i in range(3)],
                    'samples')
    return ENSEMBLE_WALKERS * ENSEMBLE_STEPS / dt


def bench_rejection_flow(setup):
    """Rejection-flow candidates/s (cached envelope) at the permissive
    bound AND at a realistic shell (loglstar = 90th pct of this flow's own
    accepted-candidate logl, ~10% shell acceptance). Candidate counts are
    accumulated across ALL timed reps and divided by total elapsed time."""
    model, params, kern, like_fn = setup
    live = 0.1 * jax.random.normal(jax.random.PRNGKey(21), (1000, X_DIM))
    mld, mr = kern.envelope(params, live, 1.1)
    mld, mr = float(mld), float(mr)

    # shell bound from one permissive batch (production sets loglstar near
    # the live set's worst point; 90th pct of candidate logl gives the
    # same ~10% acceptance the sampler sees once the shell has shrunk)
    x, logl, derived, ok, n_evals = kern.rejection_flow(
        params, jax.random.PRNGKey(99), -1e9, mld, mr, 1.1,
        REJECTION_TRIALS)
    logl, ok = np.asarray(logl), np.asarray(ok)
    shell = float(np.percentile(logl[ok], 90.0))

    def timed_rate(loglstar):
        def run(key):
            return kern.rejection_flow(params, key, loglstar, mld, mr,
                                       1.1, REJECTION_TRIALS)
        out = run(jax.random.PRNGKey(22))
        jax.block_until_ready(out[3])
        n_ok = 0
        t0 = time.perf_counter()
        for i in range(5):
            _, _, _, ok_i, _ = run(jax.random.PRNGKey(23 + i))
            n_ok += int(np.asarray(ok_i).sum())  # pull forces completion
        return n_ok / (time.perf_counter() - t0)

    return timed_rate(np.float32(-1e9)), timed_rate(np.float32(shell))


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
    setup = _setup()
    mcmc_rate = bench_mcmc(setup)
    nested_rate = bench_nested_kernel(setup)
    slice_rate = bench_slice_kernel(setup)
    ensemble_rate = bench_ensemble_stretch(setup)
    rejection_rate, shell_rate = bench_rejection_flow(setup)
    train_rate = bench_train()
    speedups = [mcmc_rate / REF_MCMC_EVALS_PER_SEC,
                nested_rate / REF_NESTED_EVALS_PER_SEC,
                slice_rate / REF_NESTED_EVALS_PER_SEC,
                ensemble_rate / REF_ENSEMBLE_EVALS_PER_SEC,
                rejection_rate / REF_REJECTION_CAND_PER_SEC,
                shell_rate / REF_REJECTION_SHELL_CAND_PER_SEC,
                train_rate / REF_TRAIN_EPOCHS_PER_SEC]
    geomean = float(np.exp(np.mean(np.log(speedups))))
    print(json.dumps({
        'metric': ('throughput speedup vs PyTorch-CPU nnest (geomean of: '
                   '16-D spline full-MH MCMC evals/s %.0f [ref %.0f], '
                   'nested constrained-MCMC evals/s %.0f [ref %.0f], '
                   'slice-kernel evals/s %.0f [ref %.0f Metropolis], '
                   'ensemble stretch evals/s %.0f [ref %.1f], '
                   'rejection-flow candidates/s %.0f [ref %.0f], '
                   'rejection-flow @10%%-shell candidates/s %.0f '
                   '[ref %.2f], flow-train epochs/s %.2f [ref %.2f])'
                   % (mcmc_rate, REF_MCMC_EVALS_PER_SEC,
                      nested_rate, REF_NESTED_EVALS_PER_SEC,
                      slice_rate, REF_NESTED_EVALS_PER_SEC,
                      ensemble_rate, REF_ENSEMBLE_EVALS_PER_SEC,
                      rejection_rate, REF_REJECTION_CAND_PER_SEC,
                      shell_rate, REF_REJECTION_SHELL_CAND_PER_SEC,
                      train_rate, REF_TRAIN_EPOCHS_PER_SEC)),
        'value': round(geomean, 2),
        'unit': 'x',
        'vs_baseline': round(geomean, 2),
    }))


if __name__ == '__main__':
    # The remote-TPU tunnel occasionally throws a transient
    # FAILED_PRECONDITION on backend init / first dispatch (measured
    # 2026-08-19: one cold invocation failed, the retry succeeded
    # unchanged). The driver runs this script ONCE per round, so retry
    # in-process rather than lose the round's bench artifact. Backend
    # state can be poisoned after the error, so retries re-exec a fresh
    # interpreter. stdout stays one JSON line (errors go to stderr).
    import subprocess
    import sys
    if os.environ.get('NNEST_BENCH_NO_RETRY'):
        main()
    else:
        last = None
        for attempt in range(3):
            if attempt == 0:
                try:
                    main()
                    break
                except Exception as e:   # noqa: BLE001
                    last = e
                    print('bench attempt 1 failed: %r; retrying in a '
                          'fresh process' % e, file=sys.stderr)
            else:
                env = dict(os.environ, NNEST_BENCH_NO_RETRY='1')
                r = subprocess.run([sys.executable, __file__], env=env)
                if r.returncode == 0:
                    break
                print('bench attempt %d failed (rc=%d)'
                      % (attempt + 1, r.returncode), file=sys.stderr)
        else:
            raise SystemExit('bench failed after 3 attempts: %r' % last)
