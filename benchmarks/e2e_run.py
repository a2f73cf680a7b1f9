"""End-to-end nested-sampling benchmark / seed-aggregation sweep runner.

Runs NestedSampler end-to-end on the canonical BASELINE.md configs and
prints one JSON line per run plus a seed-aggregated summary per config
(the reference's aggregation protocol,
``/root/reference/examples/nested/analyse.py:89-95``: mean +/- scatter of
logZ over repeated seeds, compared against the analytic truth and the
per-run sqrt(h/N) error estimate).

Examples:
  # warm-wall probe: 3 in-process repeats of the 10-D Gaussian
  python benchmarks/e2e_run.py --config gaussian:10 --seeds 0,1,2

  # calibration sweep on the real TPU (background it - takes ~1-2 h)
  python benchmarks/e2e_run.py --config gaussian:30 gaussian:50 \
      rosenbrock:20 --seeds 0,1,2,3
"""

import argparse
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def analytic_gaussian_logz(dim, lim=3.0, sigma=1.0):
    """Gaussian(sigma) in a [-lim, lim]^dim box prior — delegates to the
    single truth source ``Gaussian.analytic_logz`` (exact truncated-box
    mass): a sigma-scaled problem maps to the unit-sigma class on the
    box [-lim/sigma, lim/sigma] up to the d*log(sigma) volume factor."""
    from nnest_tpu.likelihoods import Gaussian
    r = lim / sigma
    return (Gaussian(dim, 0.0).analytic_logz([-r] * dim, [r] * dim)
            - dim * math.log(sigma))


def run_config(name, dim, seed, log_root, num_live_points, dlogz,
               train_iters, retrain_nll_threshold, mcmc_steps=0,
               mcmc_num_chains=None, gauss_lim=3.0, hidden_dim=0,
               num_blocks=3, strategy=None, slice_steps=0,
               mcmc_speculate=False, slice_adapt='cov', mcmc_adapt='cov',
               max_iters=0):
    import numpy as np
    from nnest_tpu import NestedSampler
    from nnest_tpu.likelihoods import (
        Eggbox, Gaussian, GaussianMix, Himmelblau, Rosenbrock)

    if name == 'gaussian':
        like = Gaussian(dim, 0.0, lim=gauss_lim)
        transform = lambda x: gauss_lim * x  # noqa: E731
        truth = analytic_gaussian_logz(dim, lim=gauss_lim)
    elif name == 'rosenbrock':
        like = Rosenbrock(dim)
        transform = lambda x: 5 * x          # noqa: E731
        truth = None
    elif name == 'eggbox':
        like = Eggbox(dim)
        transform = lambda x: 5 * math.pi * x  # noqa: E731
        truth = 235.8952   # scipy dblquad over [-5pi,5pi]^2 (BENCHMARKS.md)
    elif name == 'mog4':
        like = GaussianMix(dim)
        transform = lambda x: 10 * x         # noqa: E731
        truth = -5.9915    # erf masses over [-10,10]^2 (BENCHMARKS.md)
    elif name == 'himmelblau':
        like = Himmelblau(dim)
        transform = lambda x: 5 * x          # noqa: E731
        truth = None
    else:
        raise ValueError(name)

    log_dir = os.path.join(log_root, '%s%d_s%d' % (name, dim, seed))
    shutil.rmtree(log_dir, ignore_errors=True)
    s = NestedSampler(dim, like, transform=transform,
                      num_live_points=num_live_points, flow='spline',
                      hidden_dim=hidden_dim, num_blocks=num_blocks,
                      log_dir=log_dir, resume=False, seed=seed)
    t0 = time.time()
    kw = {}
    if retrain_nll_threshold != 'default':
        kw['retrain_nll_threshold'] = (
            None if retrain_nll_threshold in ('none', 'None')
            else float(retrain_nll_threshold))
    if mcmc_steps:
        kw['mcmc_steps'] = int(mcmc_steps)
    if mcmc_num_chains:
        kw['mcmc_num_chains'] = int(mcmc_num_chains)
    if strategy:
        kw['strategy'] = list(strategy)
    if slice_steps:
        kw['slice_steps'] = int(slice_steps)
    if mcmc_speculate:
        kw['mcmc_speculate'] = True
    if slice_adapt != 'cov':
        kw['slice_adapt'] = slice_adapt
    if mcmc_adapt != 'cov':
        kw['mcmc_adapt'] = mcmc_adapt
    if max_iters:
        # truncated runs: logz is NOT converged — for diagnostic-only
        # sweeps (e.g. measuring the mixing ratio of a deliberately
        # crippled kernel without paying its full dispatch-bound wall)
        kw['max_iters'] = int(max_iters)
    s.run(train_iters=train_iters, dlogz=dlogz, **kw)
    wall = time.time() - t0
    phases = {k: round(v['total_s'], 2)
              for k, v in s.timers.summary().items()}
    plot_s = getattr(s.trainer, 'plot_seconds', 0.0)
    if plot_s:
        phases['train_plot'] = round(plot_s, 2)
    rec = {
        'config': '%s:%d' % (name, dim), 'seed': seed,
        'logz': round(float(s.logz), 4),
        'logzerr': round(float(s.logzerr), 4),
        'truth': None if truth is None else round(truth, 4),
        'ncall': int(s.total_calls), 'niter': int(s.niter),
        'insertion_p': None if s.insertion_p_value is None
        else round(float(s.insertion_p_value), 4),
        'logzerr_bootstrap': None if s.logzerr_bootstrap is None
        else round(float(s.logzerr_bootstrap), 4),
        'mixing_min_ratio': None
        if getattr(s, 'mixing_min_ratio', None) is None
        else round(float(s.mixing_min_ratio), 4),
        'mixing_min_ratio_eig': None
        if getattr(s, 'mixing_min_ratio_eig', None) is None
        else round(float(s.mixing_min_ratio_eig), 4),
        'mixing_rel_ratio': None
        if getattr(s, 'mixing_rel_ratio', None) is None
        else round(float(s.mixing_rel_ratio), 4),
        'quality_flags': list(getattr(s, 'run_quality_flags', []) or []),
        'latent_cond_median': None
        if getattr(s, 'latent_cond_median', None) is None
        else round(float(s.latent_cond_median), 2),
        'latent_cond_rel': None
        if getattr(s, 'latent_cond_rel', None) is None
        else round(float(s.latent_cond_rel), 3),
        'logzerr_adjusted': round(float(getattr(
            s, 'logzerr_adjusted', s.logzerr)), 4),
        'wall_s': round(wall, 1), 'phases': phases,
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', nargs='+', required=True,
                    help='likelihood:dim, e.g. gaussian:10 rosenbrock:20')
    ap.add_argument('--seeds', default='0,1,2,3')
    ap.add_argument('--num_live_points', type=int, default=1000)
    ap.add_argument('--dlogz', type=float, default=0.1)
    ap.add_argument('--train_iters', type=int, default=500)
    ap.add_argument('--retrain_nll_threshold', default='default',
                    help="'default', 'none', or a float")
    ap.add_argument('--mcmc_steps', type=int, default=0,
                    help='0 = sampler default (5*dim)')
    ap.add_argument('--mcmc_num_chains', type=int, default=0,
                    help='0 = sampler default')
    ap.add_argument('--strategy', default='',
                    help="comma list, e.g. 'rejection_prior,slice' "
                         "(empty = sampler default ladder)")
    ap.add_argument('--slice_steps', type=int, default=0,
                    help='0 = sampler default (2*dim)')
    ap.add_argument('--mcmc_speculate', action='store_true',
                    help='speculative generation prefetch past retrain '
                         'boundaries (bit-identical results)')
    ap.add_argument('--slice_adapt', choices=('cov', 'iso'),
                    default='cov')
    ap.add_argument('--mcmc_adapt', choices=('cov', 'iso'),
                    default='cov',
                    help="Metropolis proposal law ('iso' = the round-4 "
                         "reference-style isotropic stream)")
    ap.add_argument('--gauss_lim', type=float, default=3.0,
                    help='half-width (in sigma) of the Gaussian box prior')
    ap.add_argument('--hidden_dim', type=int, default=0,
                    help='0 = sampler auto-capacity law')
    ap.add_argument('--num_blocks', type=int, default=3)
    ap.add_argument('--log_root', default='/tmp/nnest_e2e')
    ap.add_argument('--max_iters', type=int, default=0,
                    help='truncate each run (diagnostic-only sweeps; '
                         'logz will not be converged)')
    ap.add_argument('--cpu', action='store_true',
                    help='force the virtual-CPU platform (8 devices)')
    args = ap.parse_args()

    if args.cpu:
        os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS', '') + \
            ' --xla_force_host_platform_device_count=8'
    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    print(json.dumps({'backend': jax.default_backend(),
                      'argv': sys.argv[1:]}), flush=True)

    import numpy as np
    seeds = [int(x) for x in args.seeds.split(',')]
    for cfg in args.config:
        name, dim = cfg.split(':')
        recs = []
        for seed in seeds:
            recs.append(run_config(
                name, int(dim), seed, args.log_root,
                args.num_live_points, args.dlogz, args.train_iters,
                args.retrain_nll_threshold, mcmc_steps=args.mcmc_steps,
                mcmc_num_chains=args.mcmc_num_chains,
                gauss_lim=args.gauss_lim, hidden_dim=args.hidden_dim,
                num_blocks=args.num_blocks,
                strategy=[m for m in args.strategy.split(',') if m],
                slice_steps=args.slice_steps,
                mcmc_speculate=args.mcmc_speculate,
                slice_adapt=args.slice_adapt,
                mcmc_adapt=args.mcmc_adapt,
                max_iters=args.max_iters))
        logzs = np.asarray([r['logz'] for r in recs])
        errs = np.asarray([r['logzerr'] for r in recs])
        truth = recs[0]['truth']
        summary = {
            'config': cfg, 'n_seeds': len(seeds),
            'logz_mean': round(float(np.mean(logzs)), 4),
            'logz_scatter': round(float(np.std(logzs, ddof=1)), 4)
            if len(seeds) > 1 else None,
            'mean_logzerr': round(float(np.mean(errs)), 4),
            # calibration check for the mixing-adjusted single-run bar:
            # seed scatter / mean adjusted sigma should land in ~[0.7,1.5]
            'mean_logzerr_adjusted': round(float(np.mean(
                [r['logzerr_adjusted'] for r in recs])), 4),
            'scatter_over_adjusted': None if len(seeds) < 2 else round(
                float(np.std(logzs, ddof=1))
                / max(float(np.mean([r['logzerr_adjusted']
                                     for r in recs])), 1e-9), 2),
            'truth': truth,
            'median_mix_eig': None if all(
                r.get('mixing_min_ratio_eig') is None for r in recs)
            else round(float(np.median(
                [r['mixing_min_ratio_eig'] for r in recs
                 if r.get('mixing_min_ratio_eig') is not None])), 4),
            'median_latent_cond': None if all(
                r.get('latent_cond_median') is None for r in recs)
            else round(float(np.median(
                [r['latent_cond_median'] for r in recs
                 if r.get('latent_cond_median') is not None])), 2),
            'median_latent_cond_rel': None if all(
                r.get('latent_cond_rel') is None for r in recs)
            else round(float(np.median(
                [r['latent_cond_rel'] for r in recs
                 if r.get('latent_cond_rel') is not None])), 3),
            'mean_wall_s': round(float(np.mean([r['wall_s']
                                                for r in recs])), 1),
        }
        if truth is not None and len(seeds) > 1:
            scatter = max(float(np.std(logzs, ddof=1)), 1e-9)
            summary['sigma_distance'] = round(
                abs(float(np.mean(logzs)) - truth) / scatter, 2)
        boots = [r['logzerr_bootstrap'] for r in recs
                 if r['logzerr_bootstrap'] is not None]
        if len(boots) == len(recs) and len(recs) > 1:
            # nestcheck implementation-error decomposition (see
            # utils/evaluation.bootstrap_logz_error): run-to-run logZ
            # variance in excess of the bootstrap sampling variance.
            var_runs = float(np.var(logzs))
            var_samp = float(np.mean(np.square(boots)))
            summary['sampling_err_bootstrap'] = round(
                math.sqrt(var_samp), 4)
            summary['implementation_err'] = round(
                math.sqrt(max(var_runs - var_samp, 0.0)), 4)
        print(json.dumps({'SUMMARY': summary}), flush=True)


if __name__ == '__main__':
    main()
