"""Measure the reference's latent ensemble (emcee stretch) throughput on
this machine's CPU — the denominator for bench.py's ensemble workload.

Protocol parity with the reference ``Sampler._ensemble_sample``
(``/root/reference/nnest/sampler.py:632-700``): emcee's EnsembleSampler
with the default stretch move calls ``transformed_loglike`` ONE WALKER AT
A TIME (the function asserts ``z.shape == (x_dim,)``), each call paying a
torch ``trainer.inverse`` on a (1, dim) batch plus the likelihood. emcee
itself is not installed in this image, so the loop below reimplements
exactly that execution profile: emcee's red-black half-ensemble stretch
proposal (Goodman & Weare 2010, a=2) in numpy, with the log-probability
of each proposal evaluated through the REFERENCE's own torch trainer one
walker at a time. Full-MH mode (loglstar=None): log p = logl + logdetJ +
prior, the reference's else-branch.

Same statistical workload as bench.py's TPU side: 16-D Rosenbrock
(x = 5u), box prior |u| <= 1, untrained 3-block spline flow, 64 walkers.
Prints one JSON line with proposal evaluations/s.
"""
import argparse
import json
import sys
import time
import types

sys.path.insert(0, '/root/reference')
for m in ('getdist', 'getdist.mcsamples', 'emcee'):
    mod = types.ModuleType(m)
    if m == 'getdist.mcsamples':
        mod.MCSamples = object
    sys.modules.setdefault(m, mod)
sys.modules['getdist'].mcsamples = sys.modules['getdist.mcsamples']

import numpy as np
import torch
torch.set_num_threads(4)

from nnest.sampler import Sampler

X_DIM = 16


def loglike(x):
    return -np.sum(100.0 * (x[:, 1:] - x[:, :-1] ** 2) ** 2
                   + (1.0 - x[:, :-1]) ** 2, axis=1)


def prior(u):
    return 0.0 if np.all(np.abs(u) <= 1.0) else -np.inf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--walkers', type=int, default=64)
    ap.add_argument('--steps', type=int, default=20)
    args = ap.parse_args()

    s = Sampler(X_DIM, loglike, transform=lambda x: 5 * x, prior=prior,
                transform_prior=False, flow='spline', num_blocks=3,
                log_dir='/tmp/refensbench', append_run_num=True)

    def log_prob_one(z_row):
        # the reference's transformed_loglike, full-MH branch
        # (sampler.py:674-687): one torch inverse per walker call
        try:
            x, log_det_j = s.trainer.inverse(z_row.reshape((1, -1)),
                                             to_numpy=True)
        except Exception:
            return -np.inf
        logl = loglike(x)
        return float(logl[0] + log_det_j[0] + prior(x[0]))

    rng = np.random.RandomState(0)
    n = args.walkers
    z = 0.1 * rng.randn(n, X_DIM)
    lp = np.array([log_prob_one(z[i]) for i in range(n)])
    half = n // 2

    a = 2.0
    n_eval = 0
    t0 = time.time()
    for _ in range(args.steps):
        for sl, other in ((slice(0, half), slice(half, None)),
                          (slice(half, None), slice(0, half))):
            cur = z[sl]
            comp = z[other]
            zeta = ((a - 1.0) * rng.uniform(size=cur.shape[0]) + 1.0) \
                ** 2 / a
            partner = comp[rng.randint(0, comp.shape[0],
                                       size=cur.shape[0])]
            prop = partner + zeta[:, None] * (cur - partner)
            lp_prop = np.array([log_prob_one(prop[i])
                                for i in range(prop.shape[0])])
            n_eval += prop.shape[0]
            log_ratio = (X_DIM - 1.0) * np.log(zeta) + lp_prop - lp[sl]
            acc = rng.uniform(size=prop.shape[0]) < np.exp(
                np.minimum(log_ratio, 0.0))
            zs = z[sl]
            lps = lp[sl]
            zs[acc] = prop[acc]
            lps[acc] = lp_prop[acc]
            z[sl] = zs
            lp[sl] = lps
    dt = time.time() - t0
    print(json.dumps({'walkers': n, 'steps': args.steps,
                      'proposal_evals': n_eval,
                      'seconds': round(dt, 2),
                      'evals_per_sec': round(n_eval / dt, 2)}))


if __name__ == '__main__':
    main()
