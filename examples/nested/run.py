"""Nested-sampling CLI (equivalent of reference examples/nested/run.py).

Example:
  python examples/nested/run.py --likelihood rosenbrock --x_dim 2
"""

import argparse
import datetime
import os
import sys
import time

sys.path.insert(0, os.path.realpath(
    os.path.join(os.path.dirname(__file__), '..', '..')))

import numpy as np


def main(args):
    from nnest_tpu import NestedSampler
    from nnest_tpu.distributions import GeneralisedNormal
    from nnest_tpu.likelihoods import (
        Himmelblau, Rosenbrock, Gaussian, Eggbox, GaussianShell, GaussianMix)

    # Normalize optional flags once: programmatic callers (tests,
    # notebooks) may pass a partial Namespace; the argparse path always
    # sets these, so a parser-wiring regression still fails loudly.
    for k, v in {'mcmc_gen_batch': 8, 'mcmc_speculate': False,
                 'rejection_gen_batch': 8, 'slice_adapt': 'cov',
                 'mcmc_adapt': 'cov'}.items():
        if not hasattr(args, k):
            setattr(args, k, v)

    if args.base_dist == 'gen_normal':
        base_dist = GeneralisedNormal(dim=args.x_dim, beta=args.beta)
    else:
        base_dist = None

    name = args.likelihood.lower()
    if name == 'himmelblau':
        like = Himmelblau(args.x_dim)
        transform = lambda x: 5 * x
    elif name == 'rosenbrock':
        like = Rosenbrock(args.x_dim)
        transform = lambda x: 5 * x
    elif name == 'gaussian':
        like = Gaussian(args.x_dim, args.corr, lim=3)
        transform = lambda x: 3 * x
    elif name == 'eggbox':
        like = Eggbox(args.x_dim)
        transform = lambda x: x * 5 * np.pi
    elif name == 'shell':
        like = GaussianShell(args.x_dim)
        transform = lambda x: 5 * x
    elif name == 'mixture':
        like = GaussianMix(args.x_dim)
        transform = lambda x: 10 * x
    else:
        raise ValueError('Likelihood not found')

    log_dir = os.path.join(args.log_dir, args.likelihood) + args.log_suffix

    sampler = NestedSampler(
        like.x_dim, like, transform=transform, log_dir=log_dir,
        num_live_points=args.num_live_points, hidden_dim=args.hidden_dim,
        num_layers=args.num_layers, num_blocks=args.num_blocks,
        num_slow=args.num_slow, base_dist=base_dist, scale=args.scale,
        flow=args.flow, seed=args.seed,
        # --resume pins the run dir (no runN suffix) and continues from
        # its newest checkpoint; resume is BIT-EXACT — the finished run
        # equals the uninterrupted one (see README: checkpoint/resume)
        append_run_num=not args.resume, resume=args.resume)
    start = time.time()
    if getattr(args, 'prewarm', False):
        # Pay the cold remote-compile cost ahead of the real run: the
        # compiled programs land in the persistent compilation cache, so
        # a subsequent identical-config run (same flags) starts warm.
        walls = sampler.prewarm(
            strategy=args.strategy.split(',') if args.strategy else None,
            train_iters=args.train_iters, mcmc_steps=args.mcmc_steps,
            mcmc_num_chains=args.mcmc_num_chains,
            mcmc_dynamic_step_size=not args.mcmc_fixed_step_size,
            mcmc_gen_batch=args.mcmc_gen_batch,
            mcmc_speculate=args.mcmc_speculate,
            slice_adapt=args.slice_adapt, mcmc_adapt=args.mcmc_adapt,
            rejection_batch_size=args.rejection_batch_size,
            rejection_gen_batch=args.rejection_gen_batch)
        print('Prewarm walls (s): %s' % walls)
        print('Run time %s' % datetime.timedelta(
            seconds=time.time() - start))
        return
    sampler.run(train_iters=args.train_iters, mcmc_steps=args.mcmc_steps,
                max_iters=args.max_iters,
                volume_switch=args.switch, jitter=args.jitter,
                mcmc_num_chains=args.mcmc_num_chains,
                mcmc_dynamic_step_size=not args.mcmc_fixed_step_size,
                strategy=args.strategy.split(',') if args.strategy else None,
                dlogz=args.dlogz,
                rejection_batch_size=args.rejection_batch_size,
                mcmc_gen_batch=args.mcmc_gen_batch,
                mcmc_speculate=args.mcmc_speculate,
                slice_adapt=args.slice_adapt,
                mcmc_adapt=args.mcmc_adapt,
                rejection_gen_batch=args.rejection_gen_batch,
                show_progress=getattr(args, 'show_progress', False))
    print('Run time %s' % datetime.timedelta(seconds=time.time() - start))
    print('logz %.3f +/- %.3f (ncall %d)' % (
        sampler.logz, sampler.logzerr, sampler.total_calls))


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--x_dim', type=int, default=2)
    parser.add_argument('--train_iters', type=int, default=2000)
    parser.add_argument('--mcmc_steps', type=int, default=0)
    parser.add_argument('--mcmc_num_chains', type=int, default=10)
    parser.add_argument('--num_live_points', type=int, default=1000)
    parser.add_argument('-mcmc_fixed_step_size', action='store_true')
    parser.add_argument('--switch', type=float, default=-1)
    parser.add_argument('--hidden_dim', type=int, default=0,
                        help='0 = auto (16 below 16-D, 32 below 32-D, '
                             '64 above)')
    parser.add_argument('--num_layers', type=int, default=1)
    parser.add_argument('--flow', type=str, default='spline')
    parser.add_argument('--num_blocks', type=int, default=3)
    parser.add_argument('--jitter', type=float, default=-1)
    parser.add_argument('--num_slow', type=int, default=0)
    parser.add_argument('--log_dir', type=str, default='logs')
    parser.add_argument('--likelihood', type=str, default='rosenbrock')
    parser.add_argument('--log_suffix', type=str, default='')
    parser.add_argument('--base_dist', type=str, default='')
    parser.add_argument('--scale', type=str, default='')
    parser.add_argument('--beta', type=float, default=8.0)
    parser.add_argument('--corr', type=float, default=0.99)
    parser.add_argument('--strategy', type=str, default='')
    parser.add_argument('--dlogz', type=float, default=0.5)
    parser.add_argument('--rejection_batch_size', type=int, default=512)
    # generations prefetched per dispatch (1 = one dispatch per pool
    # generation; results are bit-identical either way)
    parser.add_argument('--mcmc_gen_batch', type=int, default=8)
    parser.add_argument('--mcmc_speculate', action='store_true',
                        help='prefetch MCMC/slice generations past retrain '
                             'boundaries, betting the NLL gate skips the '
                             'retrain; lost bets rewind the PRNG key so '
                             'results stay bit-identical')
    parser.add_argument('--rejection_gen_batch', type=int, default=8)
    parser.add_argument('--slice_adapt', choices=('cov', 'iso'),
                        default='cov',
                        help='slice direction law: live-set latent '
                             'covariance (default) or isotropic')
    parser.add_argument('--mcmc_adapt', choices=('cov', 'iso'),
                        default='cov',
                        help='Metropolis proposal law: covariance-'
                             'preconditioned dz ~ N(0, scale^2 C_live) '
                             '(default) or the reference isotropic')
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--resume', action='store_true',
                        help='fixed run dir + bit-exact resume from its '
                             'newest checkpoint')
    parser.add_argument('--show_progress', action='store_true',
                        help='tqdm progress bar on the nested iteration '
                             'loop (reference parity: sampler.py:256,654)')
    parser.add_argument('--prewarm', action='store_true',
                        help='compile-and-cache the device programs for '
                             'this configuration, then exit (run the '
                             'same flags afterwards to start warm; see '
                             'NestedSampler.prewarm)')
    parser.add_argument('--max_iters', type=int, default=1000000,
                        help='stop after N iterations (checkpointed; '
                             're-run with --resume to continue exactly)')
    main(parser.parse_args())
