"""Multi-device tests on the 8-way virtual CPU mesh: sharded training step,
sharded MCMC, graft entry points."""

import importlib.util
import os
import sys

import jax
import numpy as np
import pytest


def _load_graft():
    spec = importlib.util.spec_from_file_location(
        '__graft_entry__',
        os.path.join(os.path.dirname(__file__), '..', '__graft_entry__.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_device_count():
    assert jax.device_count() == 8


def test_graft_entry_compiles():
    mod = _load_graft()
    fn, args = mod.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))


@pytest.mark.parametrize('n', [2, 4, 8])
def test_dryrun_multichip(n):
    mod = _load_graft()
    mod.dryrun_multichip(n)


def test_sharded_mcmc_matches_unsharded():
    """Sharding the chain axis must not change the sampled trajectory (same
    PRNG, same program; SPMD is a layout choice, not an algorithm change)."""
    import jax.numpy as jnp
    from nnest_tpu.flows import build_flow
    from nnest_tpu.parallel import get_mesh, make_sharded_mcmc
    from nnest_tpu.samplers.kernels import LatentKernels

    x_dim = 4
    model = build_flow(x_dim, flow='choleksy')
    x = jnp.asarray(np.random.RandomState(0).normal(size=(16, x_dim)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    def like_fn(u):
        return -0.5 * jnp.sum(u ** 2, -1), jnp.zeros((u.shape[0], 0))

    def prior_fn(u):
        return jnp.zeros(u.shape[0])

    kern = LatentKernels(model, like_fn, prior_fn)
    z0 = jax.random.normal(jax.random.PRNGKey(1), (16, x_dim))
    x0, _ = model.inverse(params, z0)
    logl0, derived0 = like_fn(x0)
    lp0 = prior_fn(x0)
    kw = dict(loglstar=None, step_size=0.5, mcmc_steps=10)

    out_plain = kern.mcmc(params, jax.random.PRNGKey(2), z0, logl0,
                          derived0, lp0, **kw)
    mesh = get_mesh(tp=1)
    out_shard = make_sharded_mcmc(kern, mesh)(
        params, jax.random.PRNGKey(2), z0, logl0, derived0, lp0, **kw)
    np.testing.assert_allclose(np.asarray(out_plain['samples']),
                               np.asarray(out_shard['samples']),
                               rtol=1e-5, atol=1e-5)


def test_broadcast_exact_preserves_float64():
    """broadcast_one_to_all device_puts f64 as f32 with x64 off; the
    bitcast wrapper must round-trip resume-state payloads exactly
    (likelihood counters above 2^24, f64 logl) and pass other dtypes
    through untouched."""
    from nnest_tpu.parallel.mesh import broadcast_exact
    tree = {
        'big_int_as_f64': np.float64(2 ** 53 - 1) * np.ones(3),
        'ncall': np.asarray([16_777_217.0], np.float64),  # 2^24 + 1
        'logl': np.array([-89.72310918473, 1e-300, -1e300], np.float64),
        'key': np.arange(4, dtype=np.uint32),
        'f32': np.asarray([1.5, 2.5], np.float32),
        'empty': np.zeros((0, 5), np.float64),
        'i64': np.asarray([2 ** 62 + 3, -7], np.int64),
        'u64': np.asarray([2 ** 63 + 11], np.uint64),
        'scalar_f64': np.float64(16_777_217.0),           # 0-d leaf
    }
    out = broadcast_exact(tree)
    for k in tree:
        assert out[k].dtype == np.asarray(tree[k]).dtype, k
        assert out[k].shape == np.asarray(tree[k]).shape, k
        assert np.array_equal(out[k], tree[k]), k
