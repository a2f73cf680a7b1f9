"""Likelihood zoo: values must match independent scipy/numpy formulas
(reference nnest/likelihoods.py), batched and single-point."""

import numpy as np
import pytest
from scipy.stats import multivariate_normal
import scipy.special

from nnest_tpu.likelihoods import (
    Rosenbrock, Himmelblau, Gaussian, Eggbox, GaussianShell,
    DoubleGaussianShell, GaussianMix)
from nnest_tpu.priors import UniformPrior


def test_rosenbrock_values():
    like = Rosenbrock(3)
    x = np.array([[1.0, 1.0, 1.0], [0.0, 0.0, 0.0], [1.0, 2.0, 5.0]])
    expected = [-np.sum(100.0 * (r[1:] - r[:-1] ** 2) ** 2
                        + (1 - r[:-1]) ** 2) for r in x]
    np.testing.assert_allclose(like(x), expected, rtol=1e-5)
    assert like.max_loglike == pytest.approx(0.0)
    assert like.num_evaluations == 4  # 3 batched + 1 from max_loglike


def test_himmelblau_modes():
    like = Himmelblau(2)
    for mode in [(3.0, 2.0), (-2.805118, 3.131312),
                 (-3.779310, -3.283186), (3.584428, -1.848126)]:
        assert like(np.array(mode)) == pytest.approx(0.0, abs=1e-3)


def test_gaussian_matches_scipy():
    like = Gaussian(4, 0.7)
    x = np.random.RandomState(0).normal(size=(10, 4))
    cov = np.eye(4) + 0.7 * (1 - np.eye(4))
    expected = multivariate_normal.logpdf(x, mean=np.zeros(4), cov=cov)
    np.testing.assert_allclose(like(x), expected, rtol=1e-4, atol=1e-4)


def test_eggbox():
    like = Eggbox(2)
    assert like(np.zeros(2)) == pytest.approx(3.0 ** 5)


def test_shells():
    like = GaussianShell(3, sigma=0.1, rshell=2, center=0)
    on_shell = np.array([2.0, 0.0, 0.0])
    assert like(on_shell) == pytest.approx(0.0)
    # scalar centers broadcast to all dims (reference likelihoods.py:117-121)
    dbl = DoubleGaussianShell(2, centers=[-4, 4])
    v = dbl(np.array([-2.0, 0.0]))
    d1 = np.sqrt((-2 + 4) ** 2 + 16)   # to center (-4,-4)
    d2 = np.sqrt((-2 - 4) ** 2 + 16)   # to center (4,4)
    expected = np.logaddexp(-((d1 - 2) ** 2) / 0.02,
                            -((d2 - 2) ** 2) / 0.02)
    assert v == pytest.approx(expected, rel=1e-4)


def test_gaussian_mix_matches_reference_formula():
    like = GaussianMix(3)
    theta = np.array([0.5, -0.2, 1.0])
    comps = []
    positions = [(0, 4), (0, -4), (4, 0), (-4, 0)]
    weights = (0.4, 0.3, 0.2, 0.1)
    for w, pos in zip(weights, positions):
        t = theta.copy()
        t[:2] -= pos
        lg = -np.sum(t ** 2) / 2 - np.log(2 * np.pi) * 3 / 2
        comps.append(lg + np.log(w))
    expected = scipy.special.logsumexp(comps)
    assert like(theta) == pytest.approx(expected, rel=1e-5)


def test_rejection_sample_and_uniform_sample():
    like = Gaussian(2, 0.0)
    prior = UniformPrior(2, -5, 5)
    prior.seed(0)
    s = like.sample(prior, 200)
    assert s.shape == (200, 2)
    assert abs(np.std(s) - 1.0) < 0.25
    pts, thresh = like.uniform_sample(prior, 100, 0.1)
    assert pts.shape == (100, 2)
    assert np.all(like(pts) >= thresh)


def test_gaussian_analytic_logz_exact_uncorrelated():
    """corr=0: the product-of-erf truncation must match the norm.cdf
    product exactly (VERDICT r4 item 8: one truth source, no -log(vol)
    approximation)."""
    from scipy.stats import norm
    like = Gaussian(3, 0.0, lim=3)
    mass = (norm.cdf(3) - norm.cdf(-3)) ** 3
    expected = np.log(mass) - np.log(6.0 ** 3)
    got = like.analytic_logz([-3.0] * 3, [3.0] * 3)
    assert got == pytest.approx(expected, abs=1e-12)
    # asymmetric box
    mass_a = (norm.cdf(2) - norm.cdf(-1)) ** 3
    expected_a = np.log(mass_a) - np.log(3.0 ** 3)
    got_a = like.analytic_logz([-1.0] * 3, [2.0] * 3)
    assert got_a == pytest.approx(expected_a, abs=1e-12)


def test_gaussian_analytic_logz_correlated_vs_quadrature():
    """corr!=0: the MVN rectangle probability path vs direct 2-D
    quadrature of the density."""
    from scipy import integrate
    corr = 0.6
    like = Gaussian(2, corr, lim=2)
    cov = np.array([[1.0, corr], [corr, 1.0]])
    prec = np.linalg.inv(cov)
    norm_c = 1.0 / (2 * np.pi * np.sqrt(np.linalg.det(cov)))

    def dens(y, x):
        v = np.array([x, y])
        return norm_c * np.exp(-0.5 * v @ prec @ v)

    mass, err = integrate.dblquad(dens, -2, 2, -2, 2, epsabs=1e-10)
    expected = np.log(mass) - np.log(16.0)
    got = like.analytic_logz([-2.0, -2.0], [2.0, 2.0])
    assert got == pytest.approx(expected, abs=1e-5)
