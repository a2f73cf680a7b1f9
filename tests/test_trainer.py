"""Trainer tests: NLL decreases on a 2-D two-moon-like target, frozen
buffers stay fixed, save/load round-trips, auto-jitter is finite."""

import os

import jax
import numpy as np
import pytest

from nnest_tpu.training.trainer import Trainer, trainable_mask, \
    _mean_nn_distance


def _ring_samples(n=600, seed=0):
    rng = np.random.RandomState(seed)
    theta = rng.uniform(0, 2 * np.pi, n)
    r = 2.0 + 0.1 * rng.normal(size=n)
    return np.stack([r * np.cos(theta), r * np.sin(theta)], axis=1)


def test_training_improves_nll(tmp_path):
    samples = _ring_samples()
    t = Trainer(2, flow='spline', log_dir=str(tmp_path), log=False,
                learning_rate=1e-3, seed=0)
    t.ensure_init(samples)
    lp_before = float(np.mean(t.log_probs(samples, to_numpy=True)))
    t.train(samples, max_iters=80, patience=80, jitter=0.01)
    lp_after = float(np.mean(t.log_probs(samples, to_numpy=True)))
    assert lp_after > lp_before + 0.3
    assert t.best_validation_epoch >= 1


def test_frozen_buffers_not_trained(tmp_path):
    samples = _ring_samples(200)
    t = Trainer(2, flow='spline', log_dir=None, log=False, seed=0)
    t.ensure_init(samples)
    before = [np.asarray(l) for l, m in zip(
        jax.tree_util.tree_leaves(t.params),
        jax.tree_util.tree_leaves(trainable_mask(t.params))) if not m]
    assert len(before) > 0  # 1x1-conv permutations exist
    t.train(samples, max_iters=5, patience=10, jitter=0.01)
    after = [np.asarray(l) for l, m in zip(
        jax.tree_util.tree_leaves(t.params),
        jax.tree_util.tree_leaves(trainable_mask(t.params))) if not m]
    for b, a in zip(before, after):
        assert np.array_equal(b, a)


def test_save_load_roundtrip(tmp_path):
    samples = _ring_samples(200)
    t = Trainer(2, flow='nvp', log_dir=str(tmp_path), log=False, seed=0)
    t.train(samples, max_iters=3, patience=5, jitter=0.01)
    z1, ld1 = t.forward(samples[:5], to_numpy=True)

    t2 = Trainer(2, flow='nvp', log_dir=None, log=False, seed=1)
    t2.load(os.path.join(str(tmp_path), 'models', 'netG.pkl'))
    z2, ld2 = t2.forward(samples[:5], to_numpy=True)
    assert np.allclose(z1, z2)
    assert np.allclose(ld1, ld2)


def test_auto_jitter():
    x = np.asarray(_ring_samples(100), dtype=np.float32)
    d = float(_mean_nn_distance(x))
    assert 0 < d < 1.0


def test_auto_jitter_dim_law():
    """jitter=-1 derives 0.2 x mean-NN distance (reference
    trainer.py:168-173) at <=16-D and divides by sqrt(d) above — the
    high-D fix for the measured training stall (BENCHMARKS.md round 5:
    at 30/50-D the reference law's noise reaches the per-dim data std
    and validation never improves past the ActNorm init)."""
    rng = np.random.RandomState(3)
    for d, shrink in ((8, 1.0), (30, 30.0 ** 0.5)):
        x = rng.uniform(-1, 1, size=(200, d)).astype(np.float32)
        nn = float(_mean_nn_distance(x))
        t = Trainer(d, hidden_dim=16, log=False, seed=0)
        t.train(x, max_iters=1, patience=1, jitter=-1)
        assert abs(t.last_training_jitter - 0.2 * nn / shrink) < 1e-6


def test_high_dim_training_progresses():
    """With the dimension-scaled auto-jitter a 30-D flow actually trains:
    validation improves well past the first epoch on structured
    (live-set-like) data. Under the reference jitter law this measured
    best_epoch=1 in every 30/50-D production run (round-5 stall bug)."""
    rng = np.random.RandomState(0)
    d = 30
    a = rng.randn(d, d) * 0.15
    cov = 0.02 * np.eye(d) + 0.1 * (a @ a.T)
    x = np.clip(rng.multivariate_normal(np.zeros(d), cov, size=600),
                -1, 1).astype(np.float32)
    t = Trainer(d, hidden_dim=16, log=False, seed=1)
    t.train(x, max_iters=50, patience=50, jitter=-1)
    assert t.best_validation_epoch >= 5


def test_tail_batch_trains():
    """batch_size does not divide the training set: the masked tail batch
    must train (reference DataLoader drop_last=False semantics,
    trainer.py:179-190) and the loss must stay finite."""
    samples = _ring_samples(233)  # 210 train / 23 valid at 0.1 split
    t = Trainer(2, flow='spline', log_dir=None, log=False,
                learning_rate=1e-3, seed=0, batch_size=100)
    t.ensure_init(samples)
    lp_before = float(np.mean(t.log_probs(samples, to_numpy=True)))
    t.train(samples, max_iters=60, patience=60, jitter=0.01)
    lp_after = float(np.mean(t.log_probs(samples, to_numpy=True)))
    assert np.isfinite(t.best_validation_loss)
    assert lp_after > lp_before + 0.2


def test_device_side_early_stop():
    """The whole early-stopped training is one device program: with a tiny
    patience the epoch count must come in well under max_iters, and
    total_iters must reflect the epochs actually run (not a chunk
    multiple)."""
    samples = _ring_samples(300, seed=1)
    t = Trainer(2, flow='spline', log_dir=None, log=False,
                learning_rate=1e-3, seed=0)
    t.train(samples, max_iters=400, patience=3, jitter=0.01)
    assert 1 <= t.total_iters < 400
    assert np.isfinite(t.best_validation_loss)
    assert t.best_validation_epoch <= t.total_iters


def test_shared_jit_across_instances():
    """Same-config Trainer instances share jitted programs (seed-sweep
    runners otherwise pay a re-trace + compile-cache load per seed) and the
    shared program gives results identical to what each instance computes
    on its own; custom base distributions opt out of sharing."""
    from nnest_tpu.training.trainer import _SHARED_JIT_CACHE
    from nnest_tpu.distributions import DiagNormal

    samples = _ring_samples(200)
    t1 = Trainer(2, flow='spline', log_dir=None, log=False,
                 learning_rate=1e-3, seed=0)
    t2 = Trainer(2, flow='spline', log_dir=None, log=False,
                 learning_rate=1e-3, seed=0)
    assert t1._config_key is not None
    assert t1._forward is t2._forward
    assert t1._log_prob is t2._log_prob

    # the shared training program must produce identical trajectories for
    # identical seeds and data (bit-level: same program, same operands)
    t1.train(samples, max_iters=15, patience=15, jitter=0.0)
    t2.train(samples, max_iters=15, patience=15, jitter=0.0)
    assert t1._epoch_cache and t2._epoch_cache
    (k1,), (k2,) = t1._epoch_cache.keys(), t2._epoch_cache.keys()
    assert t1._epoch_cache[k1] is t2._epoch_cache[k2]
    assert t1.best_validation_loss == t2.best_validation_loss
    for a, b in zip(jax.tree_util.tree_leaves(t1.params),
                    jax.tree_util.tree_leaves(t2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # different config must NOT share
    t3 = Trainer(2, flow='spline', log_dir=None, log=False,
                 learning_rate=5e-4, seed=0)
    assert t3._forward is not t1._forward

    # unhashable/custom base_dist disables sharing entirely
    t4 = Trainer(2, flow='spline', log_dir=None, log=False,
                 learning_rate=1e-3, seed=0, base_dist=DiagNormal(2))
    assert t4._config_key is None
    assert t4._forward is not t1._forward
    assert not any(k[0] is None for k in _SHARED_JIT_CACHE)


def test_capacity_autoscale_law():
    """hidden_dim=0 (the default) derives conditioner width from x_dim:
    16 below 16-D (round-4 width, pins the 10-D warm wall), 32 below
    32-D, 64 at/above 32-D; an explicit hidden_dim always wins
    (VERDICT r4 item 2 — spend the roofline-measured free compute)."""
    from nnest_tpu import NestedSampler
    from nnest_tpu.likelihoods import Gaussian
    for d, expect in ((2, 16), (10, 16), (16, 32), (31, 32), (32, 64),
                      (50, 64)):
        s = NestedSampler(d, Gaussian(d, 0.0), log_dir=None, resume=False)
        assert s.trainer._config_key[2] == expect, (d, expect)
    s = NestedSampler(20, Gaussian(20, 0.0), hidden_dim=48, log_dir=None,
                      resume=False)
    assert s.trainer._config_key[2] == 48
