"""Kernel tests: constrained Metropolis respects the hard likelihood bound,
full-MH and stretch kernels sample a known Gaussian correctly, rejection /
density kernels return only valid candidates, and ncall accounting matches
the reference's masked-evaluation rule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnest_tpu.flows import build_flow
from nnest_tpu.samplers.kernels import LatentKernels


@pytest.fixture(scope='module')
def gauss_setup():
    """Identity-ish Cholesky flow + 2-D standard normal likelihood."""
    dim = 2
    model = build_flow(dim, flow='choleksy')
    x = jnp.asarray(np.random.RandomState(0).normal(size=(64, dim)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    def like_fn(u):
        logl = -0.5 * jnp.sum(u ** 2, axis=-1)
        return logl, jnp.zeros((u.shape[0], 0), jnp.float32)

    def prior_fn(u):
        inside = jnp.all(jnp.abs(u) <= 10.0, axis=-1)
        return jnp.where(inside, 0.0, -jnp.inf)

    kern = LatentKernels(model, like_fn, prior_fn)
    return model, params, kern, like_fn


def test_constrained_mcmc_respects_loglstar(gauss_setup):
    model, params, kern, like_fn = gauss_setup
    num_chains, steps = 16, 50
    key = jax.random.PRNGKey(1)
    # start from points satisfying logl > loglstar
    z0 = 0.3 * jax.random.normal(key, (num_chains, 2))
    x0, _ = model.inverse(params, z0)
    logl0, derived0 = like_fn(x0)
    loglstar = -2.0
    assert np.all(np.asarray(logl0) > loglstar)
    out = kern.mcmc(params, jax.random.PRNGKey(2), z0, logl0, derived0,
                    jnp.zeros(num_chains), loglstar=loglstar,
                    step_size=0.5, mcmc_steps=steps)
    lls = np.asarray(out['loglikes'])
    assert lls.shape == (num_chains, steps + 1)
    assert np.all(lls > loglstar)
    assert int(out['accepted']) > 0
    # ncall counts only prior/Jacobian-passing lanes
    assert 0 < int(out['ncall']) <= num_chains * steps


def test_full_mh_targets_gaussian(gauss_setup):
    model, params, kern, like_fn = gauss_setup
    num_chains, steps = 64, 400
    z0 = jax.random.normal(jax.random.PRNGKey(3), (num_chains, 2))
    x0, _ = model.inverse(params, z0)
    logl0, derived0 = like_fn(x0)
    out = kern.mcmc(params, jax.random.PRNGKey(4), z0, logl0, derived0,
                    jnp.zeros(num_chains), loglstar=None,
                    step_size=1.0, mcmc_steps=steps,
                    dynamic_step_size=True)
    xs = np.asarray(out['samples'])[:, 100:, :].reshape(-1, 2)
    assert abs(np.mean(xs)) < 0.15
    assert abs(np.std(xs) - 1.0) < 0.15
    assert int(out['ncall']) == num_chains * steps


def test_stretch_targets_gaussian(gauss_setup):
    model, params, kern, like_fn = gauss_setup
    num_walkers, steps = 64, 300
    z0 = jax.random.normal(jax.random.PRNGKey(5), (num_walkers, 2))
    out = kern.stretch(params, jax.random.PRNGKey(6), z0, mcmc_steps=steps)
    xs = np.asarray(out['samples'])[:, 100:, :].reshape(-1, 2)
    assert abs(np.mean(xs)) < 0.15
    assert abs(np.std(xs) - 1.0) < 0.15
    acc = int(out['accepted']) / (steps * num_walkers)
    assert 0.1 < acc < 0.9


def test_density_kernel(gauss_setup):
    model, params, kern, like_fn = gauss_setup
    x, logl, derived, ok, n_evals = kern.density(
        params, jax.random.PRNGKey(7), -0.5, 256)
    ok = np.asarray(ok)
    assert np.all(np.asarray(logl)[ok] > -0.5)
    assert int(n_evals) == 256  # all inside the wide prior box


def test_rejection_flow_kernel(gauss_setup):
    model, params, kern, like_fn = gauss_setup
    live = 0.5 * jax.random.normal(jax.random.PRNGKey(8), (128, 2))
    mld, mr = kern.envelope(params, live, 1.1)
    x, logl, derived, ok, n_evals = kern.rejection_flow(
        params, jax.random.PRNGKey(9), -1.0, float(mld), float(mr),
        1.1, 256)
    ok = np.asarray(ok)
    assert np.all(np.asarray(logl)[ok] > -1.0)
    assert 0 <= int(n_evals) <= 256


def test_endpoint_mode_full_chain_stats(gauss_setup):
    """Endpoint-only mode computes ESS / acceptance / jump on device over
    ALL chains; they must match host statistics of the identical
    collect_chains=True trajectory (reference full-chain stats,
    sampler.py:474-492)."""
    from nnest_tpu.utils.evaluation import effective_sample_size
    model, params, kern, like_fn = gauss_setup
    num_chains, steps = 32, 120
    z0 = jax.random.normal(jax.random.PRNGKey(11), (num_chains, 2))
    x0, _ = model.inverse(params, z0)
    logl0, derived0 = like_fn(x0)
    mu = np.zeros(2)
    var = np.ones(2)
    kw = dict(loglstar=None, step_size=0.8, mcmc_steps=steps)
    full = kern.mcmc(params, jax.random.PRNGKey(12), z0, logl0, derived0,
                     jnp.zeros(num_chains), collect_chains=True, **kw)
    endp = kern.mcmc(params, jax.random.PRNGKey(12), z0, logl0, derived0,
                     jnp.zeros(num_chains), collect_chains=False,
                     stat_moments=(mu, var), **kw)
    # identical trajectories: endpoints equal the last collected state
    np.testing.assert_allclose(np.asarray(endp['final_x']),
                               np.asarray(full['samples'])[:, -1, :],
                               rtol=1e-6, atol=1e-6)
    chains = np.asarray(full['samples'], dtype=np.float64)
    host_ess = effective_sample_size(chains, mu, var)
    np.testing.assert_allclose(np.asarray(endp['ess']), host_ess,
                               rtol=2e-3)
    assert abs(float(endp['acceptance'])
               - int(full['accepted']) / (steps * num_chains)) < 1e-6
    assert float(endp['mean_jump']) > 0.0


def test_mcmc_from_live_matches_unfused(gauss_setup):
    """The fused single-dispatch pool generation (``mcmc_from_live``) is
    bit-identical to the unfused host sequence it replaces: jitted index
    draw -> host row select -> forward/inverse re-projection -> constrained
    endpoint-only chain scan (the mesh route, nested.py:378-396). Same two
    keys in the same roles; selection is an exact one-hot masked sum."""
    model, params, kern, like_fn = gauss_setup
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
        mcmc_steps=steps)

    # Unfused oracle: replicate the mesh route's host-side composition.
    idx = np.asarray(jax.jit(
        lambda k: jax.random.randint(k, (num_chains,), 0, n_live))(key_idx))
    x0 = jnp.asarray(active_u[idx])
    logl0 = jnp.asarray(active_logl[idx])
    derived0 = jnp.asarray(active_derived[idx])
    z0, _ = model.forward(params, x0)
    x0p, _ = model.inverse(params, z0)
    lp0 = kern.prior_fn(x0p)
    unfused = kern.mcmc(
        params, key_chain, z0, logl0, derived0, lp0,
        loglstar=loglstar, step_size=0.7, mcmc_steps=steps,
        collect_chains=False,
        stat_moments=(np.mean(active_u, axis=0),
                      np.var(active_u, axis=0)))

    for field in ('final_x', 'final_logl', 'moved'):
        np.testing.assert_array_equal(np.asarray(fused[field]),
                                      np.asarray(unfused[field]),
                                      err_msg=field)
    assert int(fused['ncall']) == int(unfused['ncall'])
    assert int(fused['accepted']) == int(unfused['accepted'])
    assert float(fused['mean_jump']) == float(unfused['mean_jump'])


def test_mcmc_from_live_nonfinite_live_logl(gauss_setup):
    """A live point whose f32 log-likelihood is -inf (the host clamps
    failed likelihoods to -1e100, which overflows float32) must poison
    ONLY the chains that select it — masked selection uses where, not an
    onehot multiply, because 0*inf = NaN would contaminate every chain's
    start state. Fused output must still match the unfused oracle route,
    which sanitizes the indexed -inf at kernel entry."""
    model, params, kern, like_fn = gauss_setup
    n_live, num_chains, steps = 8, 16, 10
    rng = np.random.RandomState(7)
    active_u = np.asarray(0.4 * rng.normal(size=(n_live, 2)), np.float32)
    logl, _ = like_fn(jnp.asarray(active_u))
    active_logl = np.asarray(logl, np.float64)
    active_logl[3] = -1e100  # exactly what safe_loglike writes
    with np.errstate(over='ignore'):  # the f32 overflow IS the test input
        active_logl = np.asarray(active_logl, np.float32)
    assert np.isinf(active_logl[3])
    active_derived = np.zeros((n_live, 0), np.float32)
    loglstar = float(np.sort(active_logl)[1])
    key_idx, key_chain = jax.random.PRNGKey(31), jax.random.PRNGKey(32)

    fused = kern.mcmc_from_live(
        params, key_idx, key_chain, active_u, active_logl, active_derived,
        num_chains=num_chains, loglstar=loglstar, step_size=0.7,
        mcmc_steps=steps)
    assert np.all(np.isfinite(np.asarray(fused['final_logl'])))

    idx = np.asarray(jax.jit(
        lambda k: jax.random.randint(k, (num_chains,), 0, n_live))(key_idx))
    assert 3 in idx and (idx != 3).any()  # both cases exercised
    z0, _ = model.forward(params, jnp.asarray(active_u[idx]))
    x0p, _ = model.inverse(params, z0)
    unfused = kern.mcmc(
        params, key_chain, z0, jnp.asarray(active_logl[idx]),
        jnp.asarray(active_derived[idx]), kern.prior_fn(x0p),
        loglstar=loglstar, step_size=0.7, mcmc_steps=steps,
        collect_chains=False,
        stat_moments=(np.mean(active_u, axis=0), np.var(active_u, axis=0)))
    for field in ('final_x', 'final_logl', 'moved'):
        np.testing.assert_array_equal(np.asarray(fused[field]),
                                      np.asarray(unfused[field]),
                                      err_msg=field)


def test_fast_slow_proposals_freeze_slow_dims():
    """With oversample_rate=1 every proposal is fast-only: slow coords of
    the latent chain never change (reference sampler.py:311-315)."""
    dim, num_slow = 4, 2
    model = build_flow(dim, flow='nvp', num_slow=num_slow)
    x = jnp.asarray(np.random.RandomState(0).normal(size=(32, dim)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    def like_fn(u):
        return -0.5 * jnp.sum(u ** 2, -1), jnp.zeros((u.shape[0], 0))

    def prior_fn(u):
        return jnp.zeros(u.shape[0])

    kern = LatentKernels(model, like_fn, prior_fn, num_slow=num_slow,
                         oversample_rate=1.0)
    z0 = jax.random.normal(jax.random.PRNGKey(1), (8, dim))
    x0, _ = model.inverse(params, z0)
    logl0, derived0 = like_fn(x0)
    out = kern.mcmc(params, jax.random.PRNGKey(2), z0, logl0, derived0,
                    jnp.zeros(8), loglstar=None, step_size=0.5,
                    mcmc_steps=20)
    latent = np.asarray(out['latent'])
    assert np.all(latent[:, :, :num_slow] == latent[:, :1, :num_slow])
    # and slow real-space outputs are invariant too
    samples = np.asarray(out['samples'])
    assert np.all(samples[:, :, :num_slow] == samples[:, :1, :num_slow])
    assert int(out['fast_calls']) == int(out['ncall'])


def test_rejection_flow_live_matches_unfused(gauss_setup):
    """The fused envelope+rejection pool generation
    (``rejection_flow_live``) is bit-identical to the two-dispatch route
    it replaces (envelope kernel -> host max-fold -> rejection kernel),
    in both fold modes."""
    model, params, kern, like_fn = gauss_setup
    live_u = jnp.asarray(
        np.random.RandomState(3).uniform(-0.8, 0.8, size=(50, 2)),
        jnp.float32)
    key = jax.random.PRNGKey(7)
    loglstar, enl, trials = -2.0, 1.1, 256

    # unfused oracle: envelope dispatch, host fold, rejection dispatch.
    # Cached host maxima always originate from device f32 pulls, so prev
    # values are exactly f32-representable by construction.
    mld_new, mr_new = jax.device_get(kern.envelope(params, live_u, enl))
    f32 = lambda v: float(np.float32(v))  # noqa: E731
    for fold, prev in (
            (False, (0.0, 0.0)),
            (True, (f32(float(mld_new) + 0.7), f32(float(mr_new) - 0.1))),
            (True, (f32(float(mld_new) - 0.5), f32(float(mr_new) + 0.4)))):
        if fold:
            mld = max(prev[0], float(mld_new))
            mr = max(prev[1], float(mr_new))
        else:
            mld, mr = float(mld_new), float(mr_new)
        ref = jax.device_get(kern.rejection_flow(
            params, key, loglstar, mld, mr, enl, trials))
        fused = jax.device_get(kern.rejection_flow_live(
            params, key, loglstar, live_u, prev[0], prev[1], fold,
            enl, enl, trials))
        assert float(fused[5]) == mld and float(fused[6]) == mr
        for a, b in zip(ref, fused[:5]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.asarray(ref[3]).sum() > 0  # some candidates accepted


def test_mcmc_pool_generations_match_sequential(gauss_setup):
    """The multi-generation MCMC batch kernel (``mcmc_pool_generations``)
    is bit-identical to dispatching ``mcmc_from_live`` once per pool
    generation with host-side consumption between them: same key split
    order, same endpoint buffers, same consumption state machine, and the
    device stops exactly at the first update_interval boundary crossing."""
    model, params, kern, like_fn = gauss_setup
    rs = np.random.RandomState(11)
    n_live, dim = 40, 2
    au = rs.uniform(-0.7, 0.7, size=(n_live, dim)).astype(np.float32)
    al = np.asarray(like_fn(jnp.asarray(au))[0], np.float32)
    ad = np.zeros((n_live, 0), np.float32)
    key = jax.random.PRNGKey(5)
    num_chains, steps, max_gens, ui = 8, 20, 4, 7
    it0 = 3

    bufs, meta, n_gens, key_out = kern.mcmc_pool_generations(
        params, key, au, al, ad, it0, 0.5, ui, 10**6,
        num_chains=num_chains, mcmc_steps=steps, max_gens=max_gens)
    bufs, meta, n_gens = jax.device_get((bufs, meta, n_gens))

    cau, cal, cad = au.copy(), al.copy(), ad.copy()
    ckey, it, gens_done, crossed = key, it0, 0, False
    for g in range(int(n_gens)):
        ckey, kidx = jax.random.split(ckey)
        ckey, kchain = jax.random.split(ckey)
        loglstar = float(cal.min())
        assert float(meta['start_loglstar'][g]) == np.float32(loglstar)
        assert int(meta['start_it'][g]) == it
        out = jax.device_get(kern.mcmc_from_live(
            params, kidx, kchain, cau, cal, cad, num_chains=num_chains,
            loglstar=loglstar, step_size=0.5, mcmc_steps=steps))
        for k_, v in out.items():
            np.testing.assert_array_equal(
                np.asarray(bufs[k_][g]), np.asarray(v), err_msg=k_)
        crossed = False
        for i in range(num_chains):
            if out['moved'][i] and out['final_logl'][i] > cal.min():
                w = int(np.argmin(cal))
                cau[w] = out['final_x'][i]
                cal[w] = out['final_logl'][i]
                it += 1
                if it % ui == 0:
                    crossed = True
        gens_done += 1
        if crossed:
            break
    # device ran exactly the generations the sequential route would have
    # before the boundary stop (or all max_gens if no crossing), and
    # advanced the key by exactly two splits per generation.
    assert int(n_gens) == gens_done
    assert crossed or int(n_gens) == max_gens
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(key_out)),
        np.asarray(jax.random.key_data(ckey)))


def test_rejection_prior_generations_match_sequential(gauss_setup):
    """The multi-generation prior-rejection kernel is bit-identical to
    dispatching ``rejection_prior`` once per pool generation with host
    consumption between: same key split order, same trial buffers, and
    the ladder stop fires exactly where the host's integer controller
    would change the trial count."""
    from nnest_tpu.priors import UniformPrior
    model, params, kern, like_fn = gauss_setup
    prior = UniformPrior(2, -1.0, 1.0)
    rs = np.random.RandomState(17)
    au = rs.uniform(-0.9, 0.9, size=(60, 2)).astype(np.float32)
    al = np.asarray(like_fn(jnp.asarray(au))[0], np.float32)
    ad = np.zeros((60, 0), np.float32)
    key = jax.random.PRNGKey(9)
    trials, max_gens, target = 64, 5, 16

    bufs, meta, n_gens, key_out = kern.rejection_prior_generations(
        prior, key, au, al, ad, 2, 10**6, 2**30,
        np.zeros(20, np.float32), 0, np.float32(1e30), target,
        num_trials=trials, max_gens=max_gens, adapt_trials=True,
        can_double=True, can_halve=False)
    bufs, meta, n_gens = jax.device_get((bufs, meta, n_gens))

    cau, cal, cad = au.copy(), al.copy(), ad.copy()
    ckey, it, ladder = key, 2, False
    for g in range(int(n_gens)):
        assert not ladder  # device must stop after a ladder trigger
        ckey, kgen = jax.random.split(ckey)
        loglstar = float(cal.min())
        assert float(meta['start_loglstar'][g]) == np.float32(loglstar)
        assert int(meta['start_it'][g]) == it
        x, logl, derived, ok = jax.device_get(kern.rejection_prior(
            prior, kgen, loglstar, trials))
        np.testing.assert_array_equal(bufs['x'][g], x)
        np.testing.assert_array_equal(bufs['logl'][g], logl)
        np.testing.assert_array_equal(bufs['ok'][g], ok)
        n_ok = int(np.asarray(ok).sum())
        ladder = n_ok < target // 2  # can_double=True, can_halve=False
        for i in range(trials):
            if ok[i] and logl[i] > cal.min():
                w = int(np.argmin(cal))
                cau[w] = x[i]
                cal[w] = logl[i]
                it += 1
    assert ladder or int(n_gens) == max_gens
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(key_out)),
        np.asarray(jax.random.key_data(ckey)))
