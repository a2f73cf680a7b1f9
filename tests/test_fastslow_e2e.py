"""Fast-slow end-to-end: nested sampling with a fast/slow split must track
fast likelihood calls separately (reference sampler.py:364-365) and still
get the evidence right; NVP scale variants and the usample rejection-flow
envelope get exercised too."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnest_tpu import NestedSampler
from nnest_tpu.distributions import GeneralisedNormal
from nnest_tpu.flows import build_flow
from nnest_tpu.likelihoods import Gaussian
from nnest_tpu.samplers.kernels import LatentKernels


def test_fastslow_nested(tmp_path):
    like = Gaussian(4, 0.0, lim=3)
    s = NestedSampler(4, like, transform=lambda x: 3 * x, num_slow=2,
                      flow='spline', num_live_points=100,
                      log_dir=str(tmp_path / 'fs'), resume=False, seed=4)
    s.run(train_iters=50, dlogz=0.3, mcmc_num_chains=16)
    # analytic logZ = 4*log(mass_1d) - 4*log(6)
    from scipy.stats import norm
    analytic = 4 * np.log(norm.cdf(3) - norm.cdf(-3)) - 4 * np.log(6.0)
    assert abs(s.logz - analytic) <= max(4 * s.logzerr, 0.6)
    # fast-only proposals happened and were counted
    assert s.total_fast_calls > 0
    assert s.total_fast_calls <= s.total_calls


@pytest.mark.parametrize('scale', ['translate', 'constant'])
def test_nvp_scale_variants_roundtrip(scale):
    dims = 4
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(10, dims)), jnp.float32)
    model = build_flow(dims, flow='nvp', scale=scale)
    params = model.init(jax.random.PRNGKey(0), x)
    z, ld_f = model.forward(params, x)
    x2, ld_i = model.inverse(params, z)
    assert np.max(np.abs(np.asarray(x2 - x))) <= 1e-5
    assert np.max(np.abs(np.asarray(ld_f + ld_i))) <= 1e-5
    if scale == 'translate':
        # NICE variant is volume preserving
        assert np.max(np.abs(np.asarray(ld_f))) == 0.0


def test_rejection_flow_usample_envelope():
    """GeneralisedNormal base provides usample: the rejection-flow kernel
    must take the uniform-box proposal branch (reference
    sampler.py:575-577)."""
    dim = 2
    base = GeneralisedNormal(dim=dim, beta=8.0)
    model = build_flow(dim, flow='choleksy', base_dist=base)
    x = jnp.asarray(np.random.RandomState(0).normal(
        scale=0.3, size=(64, dim)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    def like_fn(u):
        return -0.5 * jnp.sum(u ** 2, -1), jnp.zeros((u.shape[0], 0),
                                                     jnp.float32)

    def prior_fn(u):
        return jnp.where(jnp.all(jnp.abs(u) <= 5.0, -1), 0.0, -jnp.inf)

    kern = LatentKernels(model, like_fn, prior_fn)
    live = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (64, dim))
    mld, mr = kern.envelope(params, live, 1.1)
    xx, logl, derived, ok, n_evals = kern.rejection_flow(
        params, jax.random.PRNGKey(2), -2.0, float(mld), float(mr),
        1.1, 256)
    ok = np.asarray(ok)
    assert ok.sum() > 0
    assert np.all(np.asarray(logl)[ok] > -2.0)
