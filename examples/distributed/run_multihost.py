"""Multi-host / multi-chip launch pattern.

TPU-native replacement for the reference's `mpirun -np N python run.py`
workflow (reference MPI plumbing: nnest/sampler.py:165-177,
nested.py:199-226): instead of N replicated processes exchanging candidate
pools over MPI, launch one JAX process per host; devices form a global mesh
and chain/trial batches are sharded over its 'dp' axis. Process 0 is the
I/O primary (run dirs, checkpoints, chain files), matching the reference's
rank-0 convention.

Single-host multi-chip needs no launcher at all — just pass a mesh:

    from nnest_tpu.parallel import get_mesh
    sampler = NestedSampler(..., mesh=get_mesh())

Multi-host (one process per host, same script everywhere):

    python run_multihost.py --coordinator <host0>:8476 \
        --num_processes N --process_id <i>
"""

import argparse


def main(args):
    from nnest_tpu.parallel import initialize_distributed, get_mesh

    if args.num_processes > 1:
        initialize_distributed(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id)

    import jax
    print('process %d/%d: %d local / %d global devices' % (
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count()))

    from nnest_tpu import NestedSampler
    from nnest_tpu.likelihoods import Gaussian

    mesh = get_mesh()  # all global devices on the dp axis
    like = Gaussian(args.x_dim, 0.0, lim=3)
    sampler = NestedSampler(
        args.x_dim, like, transform=lambda x: 3 * x,
        num_live_points=args.num_live_points, flow='spline',
        log_dir=args.log_dir, mesh=mesh, seed=args.seed)
    sampler.run(mcmc_num_chains=args.mcmc_num_chains, dlogz=args.dlogz)
    if sampler.single_or_primary_process:
        print('logz %.3f +- %.3f (ncall %d)' % (
            sampler.logz, sampler.logzerr, sampler.total_calls))


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--coordinator', type=str, default='localhost:8476')
    p.add_argument('--num_processes', type=int, default=1)
    p.add_argument('--process_id', type=int, default=0)
    p.add_argument('--x_dim', type=int, default=10)
    p.add_argument('--num_live_points', type=int, default=1000)
    p.add_argument('--mcmc_num_chains', type=int, default=256)
    p.add_argument('--dlogz', type=float, default=0.5)
    p.add_argument('--log_dir', type=str, default='logs/multihost')
    p.add_argument('--seed', type=int, default=0)
    main(p.parse_args())
