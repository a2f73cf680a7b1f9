"""Multimodal evidence (4-mode Gaussian mixture with analytic logZ, mode
hopping via the flow) and derived-parameter plumbing through the whole
nested pipeline (reference supports num_derived, sampler.py:120-133)."""

import numpy as np

from nnest_tpu import NestedSampler
from nnest_tpu.likelihoods import GaussianMix


def test_gaussian_mix_evidence(tmp_path):
    """Four well-separated modes in [-10,10]²: each integrates to ~1, the
    weights sum to 1, so logZ ≈ -log(volume) = -log(400)."""
    like = GaussianMix(2)
    s = NestedSampler(2, like, transform=lambda x: 10 * x,
                      num_live_points=300,
                      log_dir=str(tmp_path / 'mix'), resume=False, seed=9)
    s.run(train_iters=200, dlogz=0.3)
    analytic = -np.log(400.0)
    assert abs(s.logz - analytic) <= max(3 * s.logzerr, 0.3)
    # all four modes represented in the posterior
    idx = s.weights > 1e-8
    post = s.samples[idx]
    for cx, cy in [(0, 4), (0, -4), (4, 0), (-4, 0)]:
        d = np.linalg.norm(post - [cx, cy], axis=1)
        assert np.sum(d < 2.0) > 5


def test_derived_parameters(tmp_path):
    """A likelihood returning (logl, derived) must flow through candidate
    pools, live points, chains, and saved posterior columns."""

    def loglike(x):
        x = np.atleast_2d(x)
        logl = -0.5 * np.sum(x ** 2, axis=1)
        derived = np.stack([np.sum(x, axis=1), np.prod(x, axis=1)], axis=1)
        return logl, derived

    s = NestedSampler(2, loglike, transform=lambda x: 3 * x,
                      num_derived=2, num_live_points=100,
                      log_dir=str(tmp_path / 'der'), resume=False, seed=3,
                      param_names=['x0', 'x1', 'd_sum', 'd_prod'])
    s.run(train_iters=50, dlogz=0.3)
    assert s.samples.shape[1] == 4  # 2 params + 2 derived
    # derived columns must be consistent with the physical params
    params = s.samples[:, :2]
    np.testing.assert_allclose(s.samples[:, 2], params.sum(axis=1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(s.samples[:, 3], params.prod(axis=1),
                               rtol=1e-4, atol=1e-4)
