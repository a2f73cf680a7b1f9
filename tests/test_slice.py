"""Slice-sampling within-shell kernel tests.

The slice kernel is a capability the reference lacks (its only constrained
kernel is fixed-scale latent Metropolis, ``sampler.py:291-370``); it targets
the same invariant distribution — the flow-pushforward prior restricted to
the hard likelihood shell — via Neal (2003) stepping-out/shrinkage, so it is
interchangeable with 'mcmc' inside nested sampling (PolyChord's design).
"""

import math

import jax
import numpy as np
import pytest

from nnest_tpu import NestedSampler
from nnest_tpu.likelihoods import Gaussian, Rosenbrock


def test_unknown_strategy_raises(tmp_path):
    like = Gaussian(2, 0.0, lim=3)
    s = NestedSampler(2, like, transform=lambda x: 3 * x,
                      num_live_points=50, log_dir=str(tmp_path / 'bad'),
                      resume=False, seed=0)
    with pytest.raises(ValueError, match='unknown strategy'):
        s.run(strategy=['rejection_prior', 'slcie'])


def test_slice_kernel_stationarity(tmp_path):
    """With no likelihood constraint the kernel's invariant distribution in
    x-space is the prior restricted to the box — uniform on [-1,1]^d. Long
    trajectories from the diagnostic chains must reproduce uniform moments
    (mean 0, var 1/3) regardless of the (untrained, non-identity) flow."""
    like = Gaussian(2, 0.0, lim=3)
    s = NestedSampler(2, like, transform=lambda x: 3 * x,
                      num_live_points=50, log_dir=str(tmp_path / 'stat'),
                      resume=False, seed=1)
    s.trainer.ensure_init()
    k = s.kernels
    key = jax.random.PRNGKey(0)
    z0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (4, 2))
    x0, _ = s.trainer._inverse(s.trainer.params, z0)
    logl0, derived0 = s.loglike(np.asarray(x0))
    out = k.slice_(s.trainer.params, key, np.asarray(z0, np.float32),
                   np.asarray(logl0, np.float32),
                   np.asarray(derived0, np.float32).reshape(4, -1)[:, :0],
                   loglstar=-1e30, width=1.0, slice_steps=600)
    chains = np.asarray(out['diag_chains'])  # (4, steps+1, 2)
    xs = chains[:, 100:, :].reshape(-1, 2)   # burn-in dropped
    assert np.all(np.abs(xs) <= 1.0 + 1e-5)
    se = 1.0 / math.sqrt(xs.shape[0] / 20.0)  # crude ESS ~ n/20
    assert np.all(np.abs(xs.mean(axis=0)) < 5 * se), xs.mean(axis=0)
    assert np.allclose(xs.var(axis=0), 1.0 / 3.0, atol=0.05), xs.var(axis=0)
    # endpoint invariants
    assert np.all(np.asarray(out['final_logl']) > -1e30)
    assert int(out['ncall']) > 0
    assert bool(np.all(np.asarray(out['moved'])))


def test_slice_cov_adapted_stationarity(tmp_path):
    """Covariance-adapted directions (slice_adapt='cov') must leave the
    invariant distribution untouched: the direction law is a fixed input
    (a function of the 'live set' operand only), so the kernel still
    reproduces uniform box moments exactly like the isotropic variant."""
    like = Gaussian(2, 0.0, lim=3)
    s = NestedSampler(2, like, transform=lambda x: 3 * x,
                      num_live_points=50, log_dir=str(tmp_path / 'cstat'),
                      resume=False, seed=1)
    s.trainer.ensure_init()
    key = jax.random.PRNGKey(0)
    z0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (4, 2))
    x0, _ = s.trainer._inverse(s.trainer.params, z0)
    logl0, derived0 = s.loglike(np.asarray(x0))
    # deliberately skewed "live set" -> strongly anisotropic direction law
    rng = np.random.default_rng(3)
    live = np.clip(rng.normal(size=(50, 2)) * [0.9, 0.05], -1, 1)
    out = s.kernels.slice_(s.trainer.params, key,
                           np.asarray(z0, np.float32),
                           np.asarray(logl0, np.float32),
                           np.asarray(derived0,
                                      np.float32).reshape(4, -1)[:, :0],
                           loglstar=-1e30, width=1.0, slice_steps=600,
                           cov_from=np.asarray(live, np.float32))
    chains = np.asarray(out['diag_chains'])
    xs = chains[:, 100:, :].reshape(-1, 2)
    assert np.all(np.abs(xs) <= 1.0 + 1e-5)
    se = 1.0 / math.sqrt(xs.shape[0] / 20.0)
    assert np.all(np.abs(xs.mean(axis=0)) < 5 * se), xs.mean(axis=0)
    assert np.allclose(xs.var(axis=0), 1.0 / 3.0, atol=0.05), xs.var(axis=0)


def test_slice_respects_likelihood_shell(tmp_path):
    """Hard-shell constraint: every accepted endpoint satisfies
    logl > loglstar; chains that never accept stay at their start."""
    like = Gaussian(2, 0.0, lim=3)
    s = NestedSampler(2, like, transform=lambda x: 3 * x,
                      num_live_points=50, log_dir=str(tmp_path / 'shell'),
                      resume=False, seed=2)
    s.trainer.ensure_init()
    z0 = 0.05 * jax.random.normal(jax.random.PRNGKey(5), (16, 2))
    x0, _ = s.trainer._inverse(s.trainer.params, z0)
    logl0, _ = s.loglike(np.asarray(x0))
    loglstar = float(np.min(logl0))
    out = s.kernels.slice_(
        s.trainer.params, jax.random.PRNGKey(6),
        np.asarray(z0, np.float32), np.asarray(logl0, np.float32),
        np.zeros((16, 0), np.float32), loglstar=loglstar, width=0.5,
        slice_steps=20)
    logl_f = np.asarray(out['final_logl'])
    moved = np.asarray(out['moved'])
    assert np.all(logl_f[moved] > loglstar)
    x_f = np.asarray(out['final_x'])
    assert np.allclose(x_f[~moved], np.asarray(x0)[~moved])


def test_slice_nested_gaussian_evidence(tmp_path):
    """E2E: 2-D Gaussian analytic evidence with the slice strategy, plus a
    healthy insertion-rank p (the kernel produces correctly-distributed
    replacements, not merely in-shell ones)."""
    from scipy.stats import norm
    like = Gaussian(2, 0.0, lim=3)
    mass = (norm.cdf(3) - norm.cdf(-3)) ** 2
    analytic = math.log(mass) - math.log(36.0)
    s = NestedSampler(2, like, transform=lambda x: 3 * x,
                      num_live_points=200,
                      log_dir=str(tmp_path / 'gauss'),
                      resume=False, seed=42)
    s.run(strategy=['rejection_prior', 'slice'], train_iters=200, dlogz=0.1)
    err = max(3 * s.logzerr, 0.15)
    assert abs(s.logz - analytic) <= err
    assert s.insertion_p_value > 1e-3


def test_slice_gen_batch_bit_identical(tmp_path):
    """Multi-generation slice prefetch (sharing mcmc_gen_batch) is
    bit-identical end-to-end to one dispatch per pool generation, and
    actually cuts dispatches (StepTimer counts ARE dispatches)."""
    like = Gaussian(2, 0.0, lim=3)
    results, dispatches = {}, {}
    for batch in (1, 8):
        s = NestedSampler(2, like, transform=lambda x: 3 * x,
                          num_live_points=100,
                          log_dir=str(tmp_path / ('b%d' % batch)),
                          resume=False, seed=7)
        s.run(strategy=['rejection_prior', 'slice'], train_iters=50,
              dlogz=0.5, volume_switch=0.5, mcmc_num_chains=10,
              slice_steps=8, mcmc_gen_batch=batch)
        results[batch] = (s.logz, s.logzerr, s.total_calls)
        dispatches[batch] = s.timers.summary()['mcmc_kernel']['count']
    assert results[1] == results[8]
    assert 2 * dispatches[8] <= dispatches[1], dispatches


def test_slice_bit_exact_resume(tmp_path):
    """Kill-and-resume equals the uninterrupted slice run bit-for-bit —
    the shared prefetch buffer and the 'slice' strategy entry survive the
    checkpoint header's method-index encoding."""
    like = Gaussian(2, 0.0, lim=3)

    def final(s):
        return (s.logz, s.h, s.total_calls, s.niter)

    kw = dict(strategy=['rejection_prior', 'slice'], train_iters=50,
              log_interval=20, dlogz=0.5, volume_switch=0.5,
              mcmc_num_chains=10, slice_steps=8, rejection_batch_size=32)

    sA = NestedSampler(2, like, transform=lambda x: 3 * x,
                       num_live_points=100,
                       log_dir=str(tmp_path / 'uninterrupted'),
                       append_run_num=False, resume=True, seed=7)
    sA.run(**kw)

    sB = NestedSampler(2, like, transform=lambda x: 3 * x,
                       num_live_points=100,
                       log_dir=str(tmp_path / 'killed'),
                       append_run_num=False, resume=True, seed=7)
    sB.run(max_iters=120, **kw)
    sC = NestedSampler(2, like, transform=lambda x: 3 * x,
                       num_live_points=100,
                       log_dir=str(tmp_path / 'killed'),
                       append_run_num=False, resume=True, seed=99)
    sC.run(**kw)
    assert final(sC) == final(sA)


def test_slice_mesh_matches_unsharded(tmp_path):
    """dp-sharding the slice chain batch over the 8-device mesh is a pure
    layout choice: same PRNG roles (idx key then chain key on both routes),
    same program, exactly the same evidence."""
    from nnest_tpu.parallel import get_mesh

    def _run(tag, mesh):
        like = Gaussian(2, 0.0, lim=3)
        s = NestedSampler(2, like, transform=lambda x: 3 * x,
                          num_live_points=100,
                          log_dir=str(tmp_path / tag), resume=False,
                          seed=5, mesh=mesh)
        s.run(strategy=['rejection_prior', 'slice'], train_iters=50,
              dlogz=0.3, mcmc_num_chains=16, slice_steps=8)
        return s.logz

    assert _run('plain', None) == _run('mesh', get_mesh(tp=1))


def test_slice_rosenbrock_evidence(tmp_path):
    """Curved degenerate target (the case slice sampling exists for):
    2-D Rosenbrock oracle band, slice strategy."""
    like = Rosenbrock(2)
    s = NestedSampler(2, like, transform=lambda x: 5 * x,
                      num_live_points=500, hidden_dim=16, num_layers=1,
                      num_blocks=3, flow='spline',
                      log_dir=str(tmp_path / 'rosen'),
                      resume=False, seed=3)
    s.run(strategy=['rejection_prior', 'slice'], mcmc_num_chains=10)
    assert abs(s.logz + 5.80) <= 0.30
