"""Mesh-sharded nested sampling: sharding the chain batch over the 8-device
mesh must give exactly the same evidence as the unsharded run (same PRNG,
same program — SPMD is a layout choice)."""

import numpy as np

from nnest_tpu import NestedSampler
from nnest_tpu.likelihoods import Gaussian
from nnest_tpu.parallel import get_mesh


def _run(tmp_path, tag, mesh):
    like = Gaussian(2, 0.0, lim=3)
    s = NestedSampler(2, like, transform=lambda x: 3 * x,
                      num_live_points=100,
                      log_dir=str(tmp_path / tag), resume=False, seed=5,
                      mesh=mesh)
    s.run(train_iters=50, dlogz=0.3, mcmc_num_chains=16)
    return s.logz


def test_mesh_matches_unsharded(tmp_path):
    logz_plain = _run(tmp_path, 'plain', None)
    logz_mesh = _run(tmp_path, 'mesh', get_mesh(tp=1))
    assert logz_plain == logz_mesh
