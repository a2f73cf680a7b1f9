"""Black-box likelihood escape hatch: a numpy-only (non-traceable) user
likelihood must still work inside the jitted kernels via io_callback, with
identical results to the pure-JAX path."""

import numpy as np

from nnest_tpu import NestedSampler
from nnest_tpu.likelihoods import Gaussian


class NumpyOnlyGaussian:
    """Deliberately jax-hostile: uses numpy control flow and scipy."""

    def __init__(self, dim):
        self.x_dim = dim
        self.calls = 0

    def __call__(self, x):
        from scipy.stats import multivariate_normal
        x = np.asarray(x, dtype=np.float64)
        self.calls += x.shape[0]
        out = np.empty(x.shape[0])
        for i in range(x.shape[0]):  # row loop: untraceable on purpose
            out[i] = multivariate_normal.logpdf(
                x[i], mean=np.zeros(self.x_dim), cov=np.eye(self.x_dim))
        return out


def test_blackbox_nested_run(tmp_path):
    like = NumpyOnlyGaussian(2)
    s = NestedSampler(2, like, transform=lambda x: 3 * x,
                      num_live_points=100,
                      log_dir=str(tmp_path / 'bb'), resume=False, seed=42)
    s.run(train_iters=50, dlogz=0.3, mcmc_num_chains=10)
    assert like.calls > 0
    # same analytic target as test_nested.test_gaussian_analytic_logz
    assert abs(s.logz + 3.589) <= 0.6


def test_blackbox_mesh_matches_unsharded(tmp_path):
    """Black-box likelihood under a dp mesh: the shard_map io_callback farm
    (base.py ``_host_batch_callback``) must reproduce the unsharded run
    exactly — sharding is a layout choice even when the likelihood lives on
    the host. (A plain ordered io_callback cannot lower under GSPMD; this
    pins the farm path that replaces the reference MPI farm,
    ``nnest/nested.py:210-226``.)"""
    from nnest_tpu.parallel import get_mesh

    def run(tag, mesh):
        s = NestedSampler(2, NumpyOnlyGaussian(2),
                          transform=lambda x: 3 * x, num_live_points=100,
                          log_dir=str(tmp_path / tag), resume=False,
                          seed=7, mesh=mesh)
        s.run(train_iters=50, dlogz=0.3, mcmc_num_chains=16)
        return s.logz, s.total_calls

    lz_plain, nc_plain = run('plain', None)
    lz_mesh, nc_mesh = run('mesh', get_mesh(tp=1))
    assert lz_plain == lz_mesh
    assert nc_plain == nc_mesh


def test_blackbox_matches_jax_path(tmp_path):
    jax_like = Gaussian(2, 0.0, lim=3)
    bb_like = NumpyOnlyGaussian(2)

    s1 = NestedSampler(2, jax_like, transform=lambda x: 3 * x,
                       num_live_points=100,
                       log_dir=str(tmp_path / 'j'), resume=False, seed=7)
    s1.run(train_iters=50, dlogz=0.3)
    s2 = NestedSampler(2, bb_like, transform=lambda x: 3 * x,
                       num_live_points=100,
                       log_dir=str(tmp_path / 'b'), resume=False, seed=7)
    s2.run(train_iters=50, dlogz=0.3)
    # identical seeds and identical log-densities → identical runs up to
    # f32 rounding in the callback round-trip
    assert abs(s1.logz - s2.logz) < 0.2
