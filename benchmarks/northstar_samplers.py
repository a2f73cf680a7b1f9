"""North-star sampler configs beyond the nested suite (BASELINE.md):

  A) 20-D Rosenbrock full-MH MCMC with 256 vmapped chains
     (MCMCSampler: bootstrap -> train -> one fused chain scan).
  B) 50-D Gaussian-shell EnsembleSampler (bootstrap + latent ensemble).

Prints one JSON line per config: posterior sanity statistics, likelihood
evaluations/s, ESS, wall. Run on the real TPU:
    nohup python benchmarks/northstar_samplers.py > /tmp/northstar.log &
Or CPU-smoke with --cpu --small.
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def mcmc_rosenbrock(dim, chains, steps, log_root, seed=0):
    import numpy as np
    from nnest_tpu import MCMCSampler
    from nnest_tpu.likelihoods import Rosenbrock
    from nnest_tpu.priors import UniformPrior

    log_dir = os.path.join(log_root, 'mcmc_rosenbrock%d' % dim)
    shutil.rmtree(log_dir, ignore_errors=True)
    like = Rosenbrock(dim)
    prior = UniformPrior(dim, -2.0, 5.0)
    s = MCMCSampler(dim, like, prior=prior, log_dir=log_dir, seed=seed)
    t0 = time.time()
    # bootstrap: alternate plain/flow-guided ensemble rounds to build
    # training samples (reference ensemble.py:81-184)
    training = s.bootstrap(20 * dim, max(64, 2 * dim), iters=2, thin=5)
    t_boot = time.time() - t0
    t1 = time.time()
    s.run(steps, chains, training, stats_interval=steps)
    wall = time.time() - t1
    warm = steps // 4
    samp = s.samples[:, warm:, :dim].reshape(-1, dim)
    # Rosenbrock marginal sanity: mode near x_i = 1; the first-coordinate
    # posterior mean is ~0.6-1.0 for the banana at this prior
    from nnest_tpu.utils.evaluation import effective_sample_size
    block = s.samples[:, warm:, :dim]
    ess = effective_sample_size(block, samp.mean(axis=0),
                                samp.var(axis=0))
    rec = {
        'config': 'mcmc_rosenbrock:%d' % dim,
        'chains': chains, 'steps': steps,
        'ncall': int(s.total_calls),
        'evals_per_sec': round(s.total_calls / max(wall, 1e-9), 1),
        'boot_s': round(t_boot, 1), 'run_s': round(wall, 1),
        'mean_x0': round(float(np.mean(samp[:, 0])), 3),
        'std_x0': round(float(np.std(samp[:, 0])), 3),
        'min_ess': round(float(np.min(ess)), 1),
        'max_ess': round(float(np.max(ess)), 1),
    }
    print(json.dumps(rec), flush=True)
    return rec


def ensemble_shell(dim, walkers, steps, log_root, seed=0):
    import numpy as np
    from nnest_tpu import EnsembleSampler
    from nnest_tpu.likelihoods import GaussianShell
    from nnest_tpu.priors import UniformPrior

    log_dir = os.path.join(log_root, 'ens_shell%d' % dim)
    shutil.rmtree(log_dir, ignore_errors=True)
    like = GaussianShell(dim, sigma=0.1, rshell=2.0)
    prior = UniformPrior(dim, -3.0, 3.0)
    s = EnsembleSampler(dim, like, prior=prior, log_dir=log_dir, seed=seed)
    t0 = time.time()
    training = s.bootstrap(20 * dim, walkers, iters=2, thin=5)
    t_boot = time.time() - t0
    t1 = time.time()
    s.run(steps, walkers, training, stats_interval=steps)
    wall = time.time() - t1
    warm = steps // 4
    samp = s.samples[:, warm:, :dim].reshape(-1, dim)
    radii = np.linalg.norm(samp, axis=1)
    rec = {
        'config': 'ensemble_shell:%d' % dim,
        'walkers': walkers, 'steps': steps,
        'ncall': int(s.total_calls),
        'evals_per_sec': round(s.total_calls / max(wall, 1e-9), 1),
        'boot_s': round(t_boot, 1), 'run_s': round(wall, 1),
        # posterior concentrates on the radius-2 shell (sigma 0.1)
        'mean_radius': round(float(np.mean(radii)), 3),
        'std_radius': round(float(np.std(radii)), 3),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cpu', action='store_true')
    ap.add_argument('--small', action='store_true',
                    help='tiny shapes for a CPU smoke test')
    ap.add_argument('--only', choices=['mcmc', 'shell'], default=None)
    ap.add_argument('--log_root', default='/tmp/nnest_northstar')
    args = ap.parse_args()

    if args.cpu:
        os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS', '') + \
            ' --xla_force_host_platform_device_count=8'
    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    print(json.dumps({'backend': jax.default_backend(),
                      'argv': sys.argv[1:]}), flush=True)

    if args.small:
        mcmc_cfg = dict(dim=4, chains=32, steps=100)
        shell_cfg = dict(dim=6, walkers=64, steps=100)
    else:
        mcmc_cfg = dict(dim=20, chains=256, steps=2000)
        shell_cfg = dict(dim=50, walkers=256, steps=2000)

    if args.only in (None, 'mcmc'):
        mcmc_rosenbrock(log_root=args.log_root, **mcmc_cfg)
    if args.only in (None, 'shell'):
        ensemble_shell(log_root=args.log_root, **shell_cfg)


if __name__ == '__main__':
    main()
