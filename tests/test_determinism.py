"""Seeded determinism: the reference runs on unseeded global RNG and is
irreproducible (SURVEY.md §4); here the same seed must give bit-identical
evidence, and different seeds must (almost surely) differ."""

import numpy as np

from nnest_tpu import NestedSampler
from nnest_tpu.likelihoods import Gaussian


def _run(tmp_path, tag, seed):
    like = Gaussian(2, 0.0, lim=3)
    s = NestedSampler(2, like, transform=lambda x: 3 * x,
                      num_live_points=100,
                      log_dir=str(tmp_path / tag), resume=False, seed=seed)
    s.run(train_iters=50, dlogz=0.3)
    return s.logz


def test_same_seed_same_logz(tmp_path):
    a = _run(tmp_path, 'a', seed=123)
    b = _run(tmp_path, 'b', seed=123)
    assert a == b


def test_different_seed_different_logz(tmp_path):
    a = _run(tmp_path, 'c', seed=1)
    b = _run(tmp_path, 'd', seed=2)
    assert a != b
