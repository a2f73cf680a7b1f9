"""Covariance-preconditioned Metropolis (mcmc_adapt='cov') tests.

The round-5 proposal law dz ~ N(0, scale^2 * C_live) — C_live the live
set's latent covariance — subsumes the reference's isotropic proposal
(``nnest/sampler.py:307-316``; C -> I recovers it). For any FIXED C the
Gaussian proposal is symmetric, so the constrained kernel's invariant
distribution (flow-pushforward prior restricted to the shell) is untouched;
these tests pin that invariance, the fused/unfused bit-identity, the
gen-batch prefetch bit-identity and mesh equality under the new default.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnest_tpu import NestedSampler
from nnest_tpu.likelihoods import Gaussian


def test_cov_proposal_stationarity(tmp_path):
    """With no likelihood constraint the constrained kernel's invariant in
    x-space is the prior box — uniform on [-1,1]^d — for ANY fixed proposal
    covariance. Feed a deliberately skewed 'live set' (strongly anisotropic
    C) and require uniform moments, exactly like the isotropic variant."""
    like = Gaussian(2, 0.0, lim=3)
    s = NestedSampler(2, like, transform=lambda x: 3 * x,
                      num_live_points=50, log_dir=str(tmp_path / 'stat'),
                      resume=False, seed=1)
    s.trainer.ensure_init()
    params = s.trainer.params
    z0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (4, 2))
    x0, _ = s.trainer._inverse(params, z0)
    logl0, _ = s.loglike(np.asarray(x0))
    rng = np.random.default_rng(3)
    live = np.clip(rng.normal(size=(50, 2)) * [0.9, 0.05], -1, 1)
    out = s.kernels.mcmc(params, jax.random.PRNGKey(0),
                         jnp.asarray(z0, jnp.float32),
                         jnp.asarray(np.asarray(logl0), jnp.float32),
                         jnp.zeros((4, 0), jnp.float32),
                         jnp.zeros(4, jnp.float32),
                         loglstar=-1e30, step_size=1.0, mcmc_steps=1500,
                         dynamic_step_size=True,
                         cov_from=np.asarray(live, np.float32))
    xs = np.asarray(out['samples'])[:, 300:, :].reshape(-1, 2)
    assert np.all(np.abs(xs) <= 1.0 + 1e-5)
    se = 1.0 / math.sqrt(xs.shape[0] / 20.0)  # crude ESS ~ n/20
    assert np.all(np.abs(xs.mean(axis=0)) < 5 * se), xs.mean(axis=0)
    assert np.allclose(xs.var(axis=0), 1.0 / 3.0, atol=0.06), xs.var(axis=0)


def test_cov_from_live_matches_unfused(tmp_path):
    """Fused mcmc_from_live(adapt_cov=True) is bit-identical to the unfused
    composition (host red-black split via kernels.live_split -> row select
    -> re-projection -> kernel with cov_from=the full live set + the
    complement cov_mask) — the preconditioning matmul runs at
    Precision.HIGHEST on both routes and the covariance half never
    includes the chain starts."""
    from nnest_tpu.flows import build_flow
    from nnest_tpu.samplers.kernels import LatentKernels
    dim = 2
    model = build_flow(dim, flow='choleksy')
    x = jnp.asarray(np.random.RandomState(0).normal(size=(64, dim)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    def like_fn(u):
        return -0.5 * jnp.sum(u ** 2, axis=-1), \
            jnp.zeros((u.shape[0], 0), jnp.float32)

    def prior_fn(u):
        return jnp.where(jnp.all(jnp.abs(u) <= 10.0, axis=-1), 0.0,
                         -jnp.inf)

    kern = LatentKernels(model, like_fn, prior_fn)
    n_live, num_chains, steps = 64, 16, 40
    rng = np.random.RandomState(42)
    active_u = np.asarray(0.4 * rng.normal(size=(n_live, 2)), np.float32)
    logl, _ = like_fn(jnp.asarray(active_u))
    active_logl = np.asarray(logl, np.float32)
    active_derived = np.zeros((n_live, 0), np.float32)
    loglstar = float(np.quantile(active_logl, 0.1))
    key_idx, key_chain = jax.random.PRNGKey(21), jax.random.PRNGKey(22)

    fused = kern.mcmc_from_live(
        params, key_idx, key_chain, active_u, active_logl, active_derived,
        num_chains=num_chains, loglstar=loglstar, step_size=0.7,
        mcmc_steps=steps, adapt_cov=True)

    idx_dev, mask_dev = kern.live_split(key_idx, n_live, num_chains)
    idx, cov_mask = np.asarray(idx_dev), np.asarray(mask_dev, bool)
    # red-black contract: every start comes from the NON-covariance half
    assert not cov_mask[idx].any()
    assert cov_mask.sum() == n_live - n_live // 2
    x0 = jnp.asarray(active_u[idx])
    logl0 = jnp.asarray(active_logl[idx])
    derived0 = jnp.asarray(active_derived[idx])
    z0, _ = model.forward(params, x0)
    x0p, _ = model.inverse(params, z0)
    lp0 = kern.prior_fn(x0p)
    unfused = kern.mcmc(
        params, key_chain, z0, logl0, derived0, lp0, cov_mask=cov_mask,
        loglstar=loglstar, step_size=0.7, mcmc_steps=steps,
        collect_chains=False,
        stat_moments=(np.mean(active_u, axis=0),
                      np.var(active_u, axis=0)),
        cov_from=active_u)

    for field in ('final_x', 'final_logl', 'moved'):
        np.testing.assert_array_equal(np.asarray(fused[field]),
                                      np.asarray(unfused[field]),
                                      err_msg=field)
    assert int(fused['ncall']) == int(unfused['ncall'])
    assert int(fused['accepted']) == int(unfused['accepted'])
    # the preconditioned proposal must actually differ from isotropic
    iso = kern.mcmc_from_live(
        params, key_idx, key_chain, active_u, active_logl, active_derived,
        num_chains=num_chains, loglstar=loglstar, step_size=0.7,
        mcmc_steps=steps, adapt_cov=False)
    assert not np.array_equal(np.asarray(iso['final_x']),
                              np.asarray(fused['final_x']))


def test_mcmc_adapt_gen_batch_bit_identical(tmp_path):
    """Multi-generation MCMC prefetch with the cov-preconditioned proposal
    (the round-5 default) stays bit-identical end-to-end to one dispatch
    per generation: the on-device per-generation covariance recompute sees
    exactly the live set the host route would pass."""
    like = Gaussian(2, 0.0, lim=3)
    results, dispatches = {}, {}
    for batch in (1, 8):
        s = NestedSampler(2, like, transform=lambda x: 3 * x,
                          num_live_points=100,
                          log_dir=str(tmp_path / ('b%d' % batch)),
                          resume=False, seed=7)
        s.run(strategy=['rejection_prior', 'mcmc'], train_iters=50,
              dlogz=0.5, volume_switch=0.5, mcmc_num_chains=10,
              mcmc_steps=10, mcmc_gen_batch=batch, mcmc_adapt='cov')
        results[batch] = (s.logz, s.logzerr, s.total_calls)
        dispatches[batch] = s.timers.summary()['mcmc_kernel']['count']
    assert results[1] == results[8]
    assert 2 * dispatches[8] <= dispatches[1], dispatches


def test_mcmc_adapt_mesh_matches_unsharded(tmp_path):
    """dp-sharding the chain batch under the cov default is still a pure
    layout choice — identical evidence (the covariance is computed in the
    kernel from the replicated live set on both routes)."""
    from nnest_tpu.parallel import get_mesh

    def _run(tag, mesh):
        like = Gaussian(2, 0.0, lim=3)
        s = NestedSampler(2, like, transform=lambda x: 3 * x,
                          num_live_points=100,
                          log_dir=str(tmp_path / tag), resume=False,
                          seed=5, mesh=mesh)
        s.run(strategy=['rejection_prior', 'mcmc'], train_iters=50,
              dlogz=0.3, mcmc_num_chains=16, mcmc_steps=10,
              volume_switch=0.5, mcmc_adapt='cov')
        return s.logz

    assert _run('plain', None) == _run('mesh', get_mesh(tp=1))


def test_mcmc_adapt_evidence_and_iso_ab(tmp_path):
    """E2E analytic evidence with the mcmc strategy under both proposal
    laws: 'cov' (default) and 'iso' (the reference-compatible round-4
    stream) must each land on the analytic logZ."""
    analytic = Gaussian(2, 0.0, lim=3).analytic_logz([-3.0] * 2, [3.0] * 2)
    for adapt in ('cov', 'iso'):
        like = Gaussian(2, 0.0, lim=3)
        s = NestedSampler(2, like, transform=lambda x: 3 * x,
                          num_live_points=200,
                          log_dir=str(tmp_path / adapt),
                          resume=False, seed=42)
        s.run(strategy=['rejection_prior', 'mcmc'], train_iters=200,
              dlogz=0.1, volume_switch=0.5, mcmc_adapt=adapt)
        err = max(3 * s.logzerr, 0.15)
        assert abs(s.logz - analytic) <= err, (adapt, s.logz, analytic)


def test_mcmc_adapt_validation(tmp_path):
    like = Gaussian(2, 0.0, lim=3)
    s = NestedSampler(2, like, transform=lambda x: 3 * x,
                      num_live_points=50, log_dir=str(tmp_path / 'bad'),
                      resume=False, seed=0)
    with pytest.raises(ValueError, match='mcmc_adapt'):
        s.run(mcmc_adapt='covv')
