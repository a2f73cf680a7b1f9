"""Worker for the multi-process distributed tests (not collected by pytest).

Runs a small nested-sampling job as one of N ``jax.distributed`` processes
on CPU — the TPU-native equivalent of the reference's ``mpirun -np N``
workflow (reference MPI plumbing ``nnest/sampler.py:165-177``,
``nnest/nested.py:199-226``): a global (dp,) mesh spans every process's
devices, chain batches are sharded over it, and process 0 is the I/O
primary. Prints one machine-readable RESULT line for the test to parse.
"""

import argparse
import json

import jax

jax.config.update('jax_platforms', 'cpu')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--coordinator', default='localhost:9711')
    p.add_argument('--num_processes', type=int, required=True)
    p.add_argument('--process_id', type=int, required=True)
    p.add_argument('--log_dir', required=True)
    p.add_argument('--max_iters', type=int, default=1000000)
    p.add_argument('--seed', type=int, default=7)
    p.add_argument('--sampler', default='nested',
                   choices=('nested', 'ensemble'))
    p.add_argument('--likelihood', default='jax',
                   choices=('jax', 'blackbox'))
    p.add_argument('--bootstrap_iters', type=int, default=1)
    a = p.parse_args()

    jax.distributed.initialize(a.coordinator, a.num_processes, a.process_id)

    import numpy as np
    from nnest_tpu.likelihoods import Gaussian
    from nnest_tpu.parallel import get_mesh
    from nnest_tpu.parallel.mesh import broadcast_exact

    # Regression probe for the exact-64-bit broadcast on the REAL
    # multi-process device path (single-process broadcast_one_to_all
    # short-circuits, so unit tests cannot catch a truncation
    # regression): values beyond f32/i32 range must survive.
    rank0 = jax.process_index() == 0
    probe = broadcast_exact({
        'f64': (np.asarray([16_777_217.0, -89.72310918473], np.float64)
                if rank0 else np.zeros(2, np.float64)),
        'i64': (np.asarray([2 ** 62 + 3], np.int64)
                if rank0 else np.zeros(1, np.int64)),
    })
    assert probe['f64'][0] == 16_777_217.0, probe
    assert probe['f64'][1] == -89.72310918473, probe
    assert probe['i64'][0] == 2 ** 62 + 3, probe

    mesh = get_mesh()  # all global devices on the dp axis
    if a.likelihood == 'blackbox':
        # Untraceable host likelihood (numpy row loop): exercises the
        # shard_map io_callback FARM under real multi-process — each rank
        # evaluates only its local dp shard on its own host, the TPU-native
        # equivalent of the reference's MPI likelihood farm
        # (nnest/nested.py:210-226). Same density as Gaussian(2, 0, lim=3)
        # so the analytic-evidence oracle applies unchanged.
        import math

        class NumpyOnlyGaussian:
            x_dim = 2

            def __call__(self, x):
                x = np.asarray(x, dtype=np.float64)
                out = np.empty(x.shape[0])
                for i in range(x.shape[0]):  # untraceable on purpose
                    out[i] = (-0.5 * np.dot(x[i], x[i])
                              - math.log(2 * math.pi))
                return out

        like = NumpyOnlyGaussian()
    else:
        like = Gaussian(2, 0.0, lim=3)

    if a.sampler == 'ensemble':
        # bootstrap with resume=True: the phase/PRNG/ncall resume decision
        # must be broadcast from rank 0 so phases stay in lockstep
        from nnest_tpu import EnsembleSampler
        from nnest_tpu.priors import UniformPrior
        e = EnsembleSampler(2, like, prior=UniformPrior(2, -3, 3),
                            log_dir=a.log_dir, append_run_num=False,
                            mesh=mesh, seed=a.seed)
        ts = e.bootstrap(mcmc_steps=30, num_walkers=16,
                         iters=a.bootstrap_iters, resume=True)
        print('RESULT ' + json.dumps({
            'pid': int(jax.process_index()),
            'nproc': int(jax.process_count()),
            'ndev': int(jax.device_count()),
            'ts_shape': list(np.asarray(ts).shape),
            'ts_sum': float(np.sum(ts)),
            'ncall': int(e.total_calls),
            'has_logs': e.logs is not None,
        }), flush=True)
        return

    from nnest_tpu import NestedSampler
    s = NestedSampler(2, like, transform=lambda x: 3 * x,
                      num_live_points=100, log_dir=a.log_dir,
                      append_run_num=False, resume=True, mesh=mesh,
                      seed=a.seed)
    s.run(train_iters=50, dlogz=0.1, max_iters=a.max_iters,
          log_interval=40, mcmc_num_chains=8)
    print('RESULT ' + json.dumps({
        'pid': int(jax.process_index()),
        'nproc': int(jax.process_count()),
        'ndev': int(jax.device_count()),
        'logz': float(s.logz),
        'logzerr': float(s.logzerr),
        'niter': int(s.niter),
        'ncall': int(s.total_calls),
        'has_logs': s.logs is not None,
    }), flush=True)


if __name__ == '__main__':
    main()
