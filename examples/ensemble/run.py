"""MCMC/ensemble CLI (equivalent of reference examples/ensemble/run.py,
updated to the current MCMCSampler.run API — the reference CLI calls a stale
signature, see SURVEY.md component #15)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.realpath(
    os.path.join(os.path.dirname(__file__), '..', '..')))


def main(args):
    from nnest_tpu import MCMCSampler, EnsembleSampler
    from nnest_tpu.likelihoods import (
        Himmelblau, Rosenbrock, Gaussian, Eggbox, GaussianShell,
        GaussianMix)
    from nnest_tpu.priors import UniformPrior

    name = args.likelihood.lower()
    if name == 'himmelblau':
        like, prior = Himmelblau(args.x_dim), UniformPrior(args.x_dim, -5, 5)
    elif name == 'rosenbrock':
        like, prior = Rosenbrock(args.x_dim), UniformPrior(args.x_dim, -2, 5)
    elif name == 'gaussian':
        like, prior = Gaussian(args.x_dim, args.corr), \
            UniformPrior(args.x_dim, -5, 5)
    elif name == 'eggbox':
        like, prior = Eggbox(args.x_dim), UniformPrior(args.x_dim, -15, 15)
    elif name == 'shell':
        like, prior = GaussianShell(args.x_dim), \
            UniformPrior(args.x_dim, -3, 3)
    elif name == 'mixture':
        like, prior = GaussianMix(args.x_dim), UniformPrior(args.x_dim, -8, 8)
    else:
        raise ValueError('Likelihood not found')

    log_dir = os.path.join(args.log_dir, args.likelihood) + args.log_suffix

    if args.sampler == 'ensemble':
        sampler = EnsembleSampler(
            like.x_dim, like, prior=prior, log_dir=log_dir,
            hidden_dim=args.hidden_dim, num_layers=args.num_layers,
            num_blocks=args.num_blocks, num_slow=args.num_slow,
            flow=args.flow, seed=args.seed)
        training = sampler.bootstrap(args.bootstrap_steps, args.num_walkers,
                                     iters=args.bootstrap_iters)
        sampler.run(args.mcmc_steps, args.num_walkers, training)
    else:
        sampler = MCMCSampler(
            like.x_dim, like, prior=prior, log_dir=log_dir,
            hidden_dim=args.hidden_dim, num_layers=args.num_layers,
            num_blocks=args.num_blocks, num_slow=args.num_slow,
            flow=args.flow, seed=args.seed)
        training = like.sample(prior, args.num_training_samples)
        sampler.run(args.mcmc_steps, args.mcmc_num_chains, training)
    print('ncall %d' % sampler.total_calls)


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--sampler', type=str, default='mcmc',
                        choices=['mcmc', 'ensemble'])
    parser.add_argument('--x_dim', type=int, default=2)
    parser.add_argument('--mcmc_steps', type=int, default=10000)
    parser.add_argument('--mcmc_num_chains', type=int, default=16)
    parser.add_argument('--num_walkers', type=int, default=64)
    parser.add_argument('--bootstrap_steps', type=int, default=500)
    parser.add_argument('--bootstrap_iters', type=int, default=1)
    parser.add_argument('--num_training_samples', type=int, default=1000)
    parser.add_argument('--hidden_dim', type=int, default=0,
                        help='0 = auto-scaled with x_dim')
    parser.add_argument('--num_layers', type=int, default=1)
    parser.add_argument('--flow', type=str, default='spline')
    parser.add_argument('--num_blocks', type=int, default=3)
    parser.add_argument('--num_slow', type=int, default=0)
    parser.add_argument('--log_dir', type=str, default='logs')
    parser.add_argument('--likelihood', type=str, default='rosenbrock')
    parser.add_argument('--log_suffix', type=str, default='')
    parser.add_argument('--corr', type=float, default=0.99)
    parser.add_argument('--seed', type=int, default=0)
    main(parser.parse_args())
