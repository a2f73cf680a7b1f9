"""Mesh-sharded training must produce bit-identical params to unsharded
training (same PRNG; sharding is a layout choice)."""

import jax
import numpy as np

from nnest_tpu.training.trainer import Trainer
from nnest_tpu.parallel import get_mesh


def _train(mesh, n=320):
    rng = np.random.RandomState(0)
    theta = rng.uniform(0, 2 * np.pi, n)
    samples = np.stack([2 * np.cos(theta), 2 * np.sin(theta)], 1) \
        + 0.1 * rng.normal(size=(n, 2))
    t = Trainer(2, flow='spline', log_dir=None, log=False,
                learning_rate=1e-3, seed=0, mesh=mesh)
    # validation_fraction 0.1 → 32 valid / 288 train; 288 % 8 == 0 and
    # 32 % 8 == 0 so both shard over the 8-device mesh
    t.train(samples, max_iters=25, patience=100, jitter=0.01)
    return t


def test_mesh_training_matches_unsharded():
    t_plain = _train(None)
    t_mesh = _train(get_mesh(tp=1))
    for a, b in zip(jax.tree_util.tree_leaves(t_plain.params),
                    jax.tree_util.tree_leaves(t_mesh.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
