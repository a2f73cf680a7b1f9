"""Safe-closure edge cases (reference sampler.py:100-163): list inputs,
single points, non-finite clamping, derived-shape validation."""

import numpy as np
import pytest

from nnest_tpu.samplers.base import Sampler
from nnest_tpu.priors import UniformPrior


def _make(loglike, num_derived=0, transform=None):
    return Sampler(2, loglike, transform=transform,
                   prior=UniformPrior(2, -5, 5), num_derived=num_derived,
                   log_dir=None, seed=0)


def test_loglike_accepts_lists_and_single_points():
    calls = []

    def loglike(x):
        calls.append(np.asarray(x).shape)
        return -np.sum(np.asarray(x) ** 2, axis=1)

    s = _make(loglike)
    logl, derived = s.loglike([[1.0, 2.0], [0.0, 0.0]])
    assert logl.shape == (2,)
    assert derived.shape == (2, 0)
    logl1, _ = s.loglike(np.array([1.0, 2.0]))
    assert logl1.shape == (1,)
    assert s.total_calls == 3


def test_nonfinite_clamped():
    def loglike(x):
        out = -np.sum(np.asarray(x) ** 2, axis=1)
        out[0] = np.nan
        return out

    s = _make(loglike)
    logl, _ = s.loglike(np.zeros((3, 2)))
    assert logl[0] == -1e100
    assert np.all(np.isfinite(logl))


def test_derived_shape_validation():
    def bad(x):
        x = np.asarray(x)
        return -np.sum(x ** 2, 1), np.zeros(x.shape[0])  # 1-D derived

    s = _make(bad, num_derived=1)
    with pytest.raises(ValueError):
        s.loglike(np.zeros((2, 2)))

    def wrong_count(x):
        x = np.asarray(x)
        return -np.sum(x ** 2, 1), np.zeros((x.shape[0], 3))

    s2 = _make(wrong_count, num_derived=1)
    with pytest.raises(ValueError):
        s2.loglike(np.zeros((2, 2)))


def test_prior_and_transform_wrappers():
    s = _make(lambda x: -np.sum(np.asarray(x) ** 2, 1),
              transform=lambda x: 2 * x)
    # prior is evaluated in transformed space by default
    # (transform_prior=True): u=3 → x=6 outside [-5,5] → -inf
    lp = s.prior(np.array([[3.0, 0.0], [1.0, 1.0]]))
    assert lp[0] == -np.inf and lp[1] == 0.0
    t = s.transform(np.array([1.0, 2.0]))
    assert t.shape == (1, 2)
    np.testing.assert_array_equal(t, [[2.0, 4.0]])
