"""Native runtime: C++ diagnostics must agree with the numpy fallbacks, and
the native chain writer must round-trip."""

import numpy as np
import pytest

from nnest_tpu import runtime


pytestmark = pytest.mark.skipif(not runtime.available(),
                                reason='no C++ toolchain')


def _chains():
    rng = np.random.RandomState(0)
    x = np.cumsum(rng.normal(size=(4, 200, 3)), axis=1)
    # inject some repeated (rejected) steps
    x[:, 50:60, :] = x[:, 49:50, :]
    return x


def test_acceptance_and_jump_match_numpy():
    x = _chains()
    moved = np.any(x[:, 1:, :] != x[:, :-1, :], axis=-1)
    assert runtime.acceptance_rate(x) == pytest.approx(float(np.mean(moved)))
    jumps = np.linalg.norm(x[:, 1:, :] - x[:, :-1, :], axis=-1)
    assert runtime.mean_jump(x) == pytest.approx(float(np.mean(jumps)))


def test_ess_matches_reference_estimator():
    x = _chains()
    mu = np.mean(x.reshape(-1, 3), axis=0)
    var = np.var(x.reshape(-1, 3), axis=0)

    # pure-python reference implementation of the truncated estimator
    b, t, d = x.shape
    acc = np.ones(d)
    y = x - mu
    for s in range(1, t):
        rho = np.mean(y[:, :-s, :] * y[:, s:, :], axis=(0, 1)) / var
        active = rho > 0.05
        if not np.any(active):
            break
        acc[active] += 2.0 * rho[active] * (1.0 - s / t)
    expected = t / acc

    got = runtime.ess(x, mu, var)
    np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_write_chain_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    n, d, nd = 50, 3, 2
    w = rng.uniform(size=n)
    logl = rng.normal(size=n)
    s = rng.normal(size=(n, d))
    der = rng.normal(size=(n, nd))
    path = str(tmp_path / 'chain.txt')
    assert runtime.write_chain(path, w, logl, s, derived=der,
                               header='weight minusloglike a b c d1 d2')
    data = np.loadtxt(path)
    assert data.shape == (n, 2 + d + nd)
    np.testing.assert_allclose(data[:, 0], w, rtol=1e-4)
    np.testing.assert_allclose(data[:, 1], -logl, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(data[:, 2:2 + d], s, rtol=1e-4, atol=1e-4)
