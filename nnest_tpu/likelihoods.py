"""Test likelihood zoo — batched pure-JAX versions of the reference problems
(``nnest/likelihoods.py:48-193``).

Design difference vs the reference: every likelihood's ``logpdf`` is a pure
JAX function of a single point (dim,) which is ``vmap``-ped over the batch and
jitted, so likelihood evaluation of thousands of live points / chains is one
fused TPU program instead of a Python loop over rows
(``likelihoods.py:17-19``). The ``__call__`` wrapper keeps the reference's
numpy-facing behaviour (accepts lists / single points, counts evaluations).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


class Likelihood:
    """Base class; subclasses implement ``logpdf(x) -> scalar`` in pure JAX."""

    num_derived = 0

    def __init__(self, x_dim: int):
        self.x_dim = x_dim
        self.num_evaluations = 0
        self._batched = jax.jit(jax.vmap(self.logpdf))

    def logpdf(self, x):
        raise NotImplementedError

    def __call__(self, x):
        if isinstance(x, list):
            x = np.asarray(x)
        x = jnp.asarray(x, dtype=jnp.float32)
        if x.ndim > 1:
            self.num_evaluations += x.shape[0]
            return np.asarray(self._batched(x), dtype=np.float64)
        self.num_evaluations += 1
        return float(self.logpdf(x))

    # --- helpers used by examples/tests (reference likelihoods.py:27-42) ---

    def sample(self, prior, num_samples, rng=None):
        """Rejection-sample `num_samples` draws under this likelihood."""
        rng = rng or np.random
        max_loglike = self.max_loglike
        out = np.empty((0, self.x_dim))
        while out.shape[0] < num_samples:
            x = prior.sample(num_samples)
            loglike = self(x)
            ratio = np.exp(loglike - max_loglike)
            keep = ratio > rng.uniform(size=(num_samples,))
            out = np.vstack((np.asarray(x)[keep], out))
        return out[:num_samples]

    def uniform_sample(self, prior, num_samples, fraction):
        """Top-`fraction` prior draws; returns (points, threshold loglike)."""
        x = prior.sample(int(num_samples / fraction))
        loglike = self(x)
        idx = np.argsort(-loglike)
        return np.asarray(x)[idx[:num_samples]], loglike[idx[num_samples - 1]]

    @property
    def max_loglike(self):
        raise NotImplementedError


class Rosenbrock(Likelihood):
    """-Σ 100(x_{i+1}-x_i²)² + (1-x_i)² (reference ``likelihoods.py:48``)."""

    def logpdf(self, x):
        return -jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                        + (1.0 - x[:-1]) ** 2)

    @property
    def max_loglike(self):
        return float(self(np.ones(self.x_dim)))

    @property
    def sample_range(self):
        return [-2] * self.x_dim, [12] * self.x_dim


class Himmelblau(Likelihood):
    """2-D four-mode surface (reference ``likelihoods.py:62``)."""

    def __init__(self, x_dim: int):
        assert x_dim == 2
        super().__init__(x_dim)

    def logpdf(self, x):
        return (-(x[0] ** 2 + x[1] - 11.0) ** 2
                - (x[0] + x[1] ** 2 - 7.0) ** 2)

    @property
    def max_loglike(self):
        return float(self(np.array([3.0, 2.0])))


class Gaussian(Likelihood):
    """Correlated MVN with pairwise correlation ``corr``
    (reference ``likelihoods.py:77``)."""

    def __init__(self, x_dim: int, corr: float, lim: float = 5):
        self.corr = corr
        self.lim = lim
        cov = np.eye(x_dim) + corr * (1.0 - np.eye(x_dim))
        self._prec = jnp.asarray(np.linalg.inv(cov), dtype=jnp.float32)
        sign, logdet = np.linalg.slogdet(cov)
        self._log_norm = -0.5 * (x_dim * math.log(2 * math.pi) + logdet)
        super().__init__(x_dim)

    def logpdf(self, x):
        return self._log_norm - 0.5 * x @ self._prec @ x

    @property
    def max_loglike(self):
        return float(self(np.zeros(self.x_dim)))

    @property
    def sample_range(self):
        return [-self.lim] * self.x_dim, [self.lim] * self.x_dim

    def analytic_logz(self, prior_lo, prior_hi):
        """Exact logZ for a uniform prior box: log(MVN mass inside the box)
        minus log(box volume). For ``corr == 0`` the mass factorizes into a
        product of 1-D erf terms; for ``corr != 0`` scipy's MVN rectangle
        probability (Genz quasi-Monte-Carlo, abs err ~1e-8) is used. This is
        the single truth source for every Gaussian evidence check (the
        earlier ``-log(vol)`` form ignored box truncation, a ~0.2% bias at
        lim = 3 sigma)."""
        lo = np.asarray(prior_lo, dtype=np.float64)
        hi = np.asarray(prior_hi, dtype=np.float64)
        vol = float(np.prod(hi - lo))
        if self.corr == 0.0:
            from scipy.special import erf
            sqrt2 = math.sqrt(2.0)
            log_mass = float(np.sum(np.log(
                0.5 * (erf(hi / sqrt2) - erf(lo / sqrt2)))))
        else:
            from scipy.stats import multivariate_normal
            cov = (np.eye(self.x_dim)
                   + self.corr * (1.0 - np.eye(self.x_dim)))
            mass = float(multivariate_normal(
                mean=np.zeros(self.x_dim), cov=cov,
                allow_singular=False).cdf(hi, lower_limit=lo))
            log_mass = math.log(mass)
        return log_mass - math.log(vol)


class Eggbox(Likelihood):
    """(2 + cos(x/2)cos(y/2))^5 (reference ``likelihoods.py:97``)."""

    def __init__(self, x_dim: int):
        assert x_dim == 2
        super().__init__(x_dim)

    def logpdf(self, x):
        chi = jnp.cos(x[0] / 2.0) * jnp.cos(x[1] / 2.0)
        return (2.0 + chi) ** 5

    @property
    def max_loglike(self):
        return float(self(np.zeros(2)))


class GaussianShell(Likelihood):
    """Thin Gaussian shell of radius ``rshell``
    (reference ``likelihoods.py:113``)."""

    def __init__(self, x_dim: int, sigma: float = 0.1, rshell: float = 2,
                 center=0):
        if not hasattr(center, '__len__'):
            center = np.full(x_dim, float(center))
        self.center = np.asarray(center, dtype=np.float32)
        self.sigma = sigma
        self.rshell = rshell
        super().__init__(x_dim)

    def logpdf(self, x):
        rad = jnp.sqrt(jnp.sum((jnp.asarray(self.center) - x) ** 2))
        return -((rad - self.rshell) ** 2) / (2.0 * self.sigma ** 2)

    @property
    def max_loglike(self):
        p = self.center.copy()
        p[0] -= self.rshell
        return float(self(p))


class DoubleGaussianShell(Likelihood):
    """Mixture of two shells (reference ``likelihoods.py:135``)."""

    def __init__(self, x_dim: int, sigmas=(0.1, 0.1), rshells=(2, 2),
                 centers=(-4, 4), weights=(1.0, 1.0)):
        self.shell1 = GaussianShell(x_dim, sigma=sigmas[0],
                                    rshell=rshells[0], center=centers[0])
        self.shell2 = GaussianShell(x_dim, sigma=sigmas[1],
                                    rshell=rshells[1], center=centers[1])
        self.weights = weights
        super().__init__(x_dim)

    def logpdf(self, x):
        return jnp.logaddexp(
            jnp.log(self.weights[0]) + self.shell1.logpdf(x),
            jnp.log(self.weights[1]) + self.shell2.logpdf(x))

    @property
    def max_loglike(self):
        return self.shell1.max_loglike + self.shell2.max_loglike


class GaussianMix(Likelihood):
    """2–4 Gaussian modes on the axes at separation ``sep`` in the first two
    dims (reference ``likelihoods.py:165``)."""

    def __init__(self, x_dim: int, sep: float = 4,
                 weights=(0.4, 0.3, 0.2, 0.1), sigma: float = 1):
        assert len(weights) in (2, 3, 4)
        assert np.isclose(sum(weights), 1.0)
        self.sep = sep
        self.weights = tuple(weights)
        self.sigma = sigma
        offsets = [(0.0, sep), (0.0, -sep), (sep, 0.0), (-sep, 0.0)]
        self.positions = np.asarray(offsets[:len(weights)], dtype=np.float32)
        super().__init__(x_dim)

    def logpdf(self, x):
        d = self.x_dim
        log_norm = -0.5 * d * jnp.log(2 * math.pi * self.sigma ** 2)
        comps = []
        for w, pos in zip(self.weights, self.positions):
            shifted = x.at[:2].add(-jnp.asarray(pos))
            lg = -jnp.sum(shifted ** 2) / (2 * self.sigma ** 2) + log_norm
            comps.append(lg + jnp.log(w))
        return jax.scipy.special.logsumexp(jnp.stack(comps))

    @property
    def max_loglike(self):
        p = np.zeros(self.x_dim, dtype=np.float32)
        p[:2] = self.positions[int(np.argmax(self.weights))]
        return float(self(p))
