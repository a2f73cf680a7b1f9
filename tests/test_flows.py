"""Flow unit tests — the port of the reference's exact/fast test class
(reference tests/test_flows.py): round-trip invertibility ≤ 1e-5, logdet
antisymmetry ≤ 1e-5, shape contracts, fast-slow exact invariance, and base
distribution pluggability; plus seeded determinism and RQS edge cases the
reference lacks (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnest_tpu.flows import build_flow
from nnest_tpu.distributions import DiagNormal, GeneralisedNormal, LogitUniform

MAX_DIFF = 1.0e-5


def _roundtrip_checks(model, params, x):
    z, z_logdet = model.forward(params, x)
    assert z.shape == x.shape
    assert z_logdet.shape == (x.shape[0],)
    x2, x_logdet = model.inverse(params, z)
    assert np.max(np.abs(np.asarray(x2 - x))) <= MAX_DIFF
    assert np.max(np.abs(np.asarray(x_logdet + z_logdet))) <= MAX_DIFF
    lp = model.log_prob(params, x)
    assert lp.shape == (x.shape[0],)
    assert np.all(np.isfinite(np.asarray(lp)))
    samples = model.sample(params, jax.random.PRNGKey(1), 10)
    assert samples.shape == (10, x.shape[1])


@pytest.mark.parametrize('flow', ['choleksy', 'cholesky', 'nvp', 'spline'])
@pytest.mark.parametrize('dims', [2, 3, 4, 5])
def test_single_speed_roundtrip(flow, dims):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(10, dims)), dtype=jnp.float32)
    model = build_flow(dims, flow=flow)
    params = model.init(jax.random.PRNGKey(0), x)
    _roundtrip_checks(model, params, x)


@pytest.mark.parametrize('base_cls', [DiagNormal, GeneralisedNormal,
                                      LogitUniform])
@pytest.mark.parametrize('dims', [2, 5])
def test_base_dist_pluggable(base_cls, dims):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(10, dims)), dtype=jnp.float32)
    model = build_flow(dims, flow='choleksy', base_dist=base_cls(dim=dims))
    params = model.init(jax.random.PRNGKey(0), x)
    _roundtrip_checks(model, params, x)


@pytest.mark.parametrize('flow', ['nvp', 'spline'])
@pytest.mark.parametrize('num_slow,num_fast', [(2, 2), (2, 3), (3, 2),
                                               (3, 5), (5, 4)])
def test_fast_slow(flow, num_slow, num_fast):
    dims = num_slow + num_fast
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(10, dims)), dtype=jnp.float32)
    model = build_flow(dims, flow=flow, num_slow=num_slow)
    params = model.init(jax.random.PRNGKey(0), x)
    _roundtrip_checks(model, params, x)

    # Exact invariance: perturbing only fast latent coords must leave the
    # slow outputs bit-identical (reference tests/test_flows.py:109-113).
    z, _ = model.forward(params, x)
    dz = jnp.asarray(rng.normal(size=z.shape) * 0.01, dtype=jnp.float32)
    dz = dz.at[:, :num_slow].set(0.0)
    x0, _ = model.inverse(params, z)
    x1, _ = model.inverse(params, z + dz)
    diff = np.asarray(x0 - x1)[:, :num_slow]
    assert np.max(np.abs(diff)) == 0.0


def test_deterministic_under_jit():
    dims = 4
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(16, dims)), dtype=jnp.float32)
    model = build_flow(dims, flow='spline')
    params = model.init(jax.random.PRNGKey(0), x)
    fwd = jax.jit(model.forward)
    z1, ld1 = fwd(params, x)
    z2, ld2 = fwd(params, x)
    assert np.array_equal(np.asarray(z1), np.asarray(z2))
    assert np.array_equal(np.asarray(ld1), np.asarray(ld2))


def test_rqs_tails_and_edges():
    """Points outside the tail bound are identity with logdet 0; points at
    bin boundaries are finite; inverse round-trips everywhere (edge cases
    around reference networks.py:524-525)."""
    from nnest_tpu.bijectors.rqs import rqs
    key = jax.random.PRNGKey(0)
    K, B = 8, 3.0
    batch, d = 7, 3
    kw, kh, kd = jax.random.split(key, 3)
    W = jax.random.normal(kw, (batch, d, K))
    H = jax.random.normal(kh, (batch, d, K))
    D = jax.random.normal(kd, (batch, d, K - 1))

    outside = jnp.full((batch, d), 5.0)
    out, ld = rqs(outside, W, H, D, inverse=False, tail_bound=B)
    assert np.array_equal(np.asarray(out), np.asarray(outside))
    assert np.all(np.asarray(ld) == 0.0)

    edges = jnp.stack([jnp.full((d,), v) for v in
                       [-B, -B + 1e-6, 0.0, B - 1e-6, B, 1.5, -2.7]])
    y, ld_f = rqs(edges, W, H, D, inverse=False, tail_bound=B)
    assert np.all(np.isfinite(np.asarray(y)))
    assert np.all(np.isfinite(np.asarray(ld_f)))
    x_back, ld_i = rqs(y, W, H, D, inverse=True, tail_bound=B)
    assert np.max(np.abs(np.asarray(x_back - edges))) <= 1e-4
    assert np.max(np.abs(np.asarray(ld_f + ld_i))) <= 1e-4


def test_spline_odd_dims():
    for dims in [3, 5, 7]:
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.normal(size=(10, dims)), dtype=jnp.float32)
        model = build_flow(dims, flow='spline')
        params = model.init(jax.random.PRNGKey(0), x)
        _roundtrip_checks(model, params, x)
