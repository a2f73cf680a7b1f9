"""Insertion-index uniformity diagnostic (Fowlie, Handley & Su 2020,
arXiv:2006.03371) — a validation feature the reference lacks: under exact
constrained sampling the rank of each replacement point among the
surviving live points is Uniform{0..n_live-1}; under-mixing skews it.
"""

import os

import numpy as np

from nnest_tpu import NestedSampler
from nnest_tpu.likelihoods import Gaussian
from nnest_tpu.utils.evaluation import (bootstrap_logz_error, insertion_ks,
                                        kolmogorov_pvalue,
                                        rolling_insertion_ks)


def _fake_run(n_live, n_dead, seed):
    """Synthetic constant-N run: iid exponential-gap logl deaths assigned
    round-robin to slots (a perfectly mixed sampler's thread structure)."""
    rng = np.random.RandomState(seed)
    logl = np.sort(rng.normal(size=n_dead + n_live)) * 5.0
    slots = np.concatenate([np.arange(n_dead) % n_live,
                            np.arange(n_live)])
    rng.shuffle(slots[:n_dead])
    return logl, slots


def test_bootstrap_deterministic_and_positive():
    logl, slots = _fake_run(50, 2000, 0)
    e1 = bootstrap_logz_error(logl, slots, 50)
    e2 = bootstrap_logz_error(logl, slots, 50)
    assert e1 == e2 and e1 > 0.0


def test_bootstrap_identical_threads_zero_error():
    """If every thread is an identical copy, resampling cannot change the
    combined run, so the bootstrap error must vanish."""
    n_live, per = 20, 30
    one = np.linspace(-50.0, 0.0, per)
    logl = np.tile(one, n_live)
    slots = np.repeat(np.arange(n_live), per)
    assert bootstrap_logz_error(logl, slots, n_live) < 1e-12


def test_insertion_ks_uniform_high_p():
    rng = np.random.RandomState(0)
    ranks = rng.randint(0, 1000, size=5000)
    d, p = insertion_ks(ranks, 1000)
    assert p > 0.05
    # matches scipy's asymptotic kstest p to ~1e-2 relative (checked
    # offline: D identical, p 0.590 vs 0.588)
    assert 0.0 <= d <= 1.0


def test_insertion_ks_skewed_low_p():
    rng = np.random.RandomState(1)
    # a sampler stuck in the lower third of the shell
    ranks = rng.randint(0, 300, size=2000)
    _, p = insertion_ks(ranks, 1000)
    assert p < 1e-6
    p_roll, n_blocks = rolling_insertion_ks(ranks, 1000)
    assert p_roll < 1e-6 and n_blocks == 2


def test_rolling_catches_local_failure():
    """A failure confined to one block must drive the rolling p down even
    when the whole-run KS stays comfortable."""
    rng = np.random.RandomState(2)
    good = rng.randint(0, 1000, size=9000)
    bad = rng.randint(0, 60, size=500)   # one sick stretch
    ranks = np.concatenate([good[:4500], bad, good[4500:]])
    _, p_whole = insertion_ks(ranks, 1000)
    p_roll, _ = rolling_insertion_ks(ranks, 1000, block=500)
    assert p_roll < 1e-6
    assert p_roll < p_whole


def test_kolmogorov_pvalue_edges():
    assert kolmogorov_pvalue(0.0, 100) == 1.0
    assert kolmogorov_pvalue(1.0, 100) < 1e-12
    assert kolmogorov_pvalue(0.5, 0) == 1.0


def test_mixing_ratio_flags_crippled_run(tmp_path):
    """Single-run start-decorrelation diagnostic (kernels.mix_ratio_device):
    a healthy mcmc run's endpoints forget their start live points
    (ratio ~1), a crippled mcmc_steps=2 run's do not (ratio << 1) — the
    between-thread correlation regime where the insertion KS and the
    single-run bootstrap are both measured blind (BENCHMARKS.md part 4)."""
    import json
    like = Gaussian(2, 0.0, lim=3)
    kw = dict(train_iters=50, log_interval=50, dlogz=0.5,
              strategy=['rejection_prior', 'mcmc'], volume_switch=0.5)
    runs = {}
    for name, steps in (('healthy', 0), ('crippled', 2)):
        s = NestedSampler(2, like, transform=lambda x: 3 * x,
                          num_live_points=100,
                          log_dir=str(tmp_path / name),
                          append_run_num=False, resume=False, seed=11)
        s.run(mcmc_steps=steps, **kw)
        assert s.mixing_min_ratio is not None
        with open(os.path.join(s.log_dir, 'results',
                               'diagnostics.json')) as f:
            assert json.load(f)['mixing_min_ratio'] == s.mixing_min_ratio
        runs[name] = s.mixing_rel_ratio
        # mixing-adjusted bar: inflated by 1/R^2 (R = eigenbasis ratio
        # relative to the kernel's healthy null), capped, never
        # deflated — and only inside the calibration domain (x_dim >=
        # 8); this 2-D run must keep the raw bar while still recording
        # the diagnostic
        assert s.logzerr_adjusted >= s.logzerr
        expected = (s.logzerr if s.x_dim < 8 else s.logzerr * min(
            100.0, max(1.0, s.mixing_rel_ratio ** -2)))
        assert abs(s.logzerr_adjusted - expected) < 1e-12
        # the one-glance verdict is recorded (the under_mixed flag is
        # gated to the calibration domain like the bar, so it must NOT
        # fire at 2-D even on the crippled run)
        assert isinstance(s.run_quality_flags, list)
        assert 'under_mixed' not in s.run_quality_flags
        with open(os.path.join(s.log_dir, 'results',
                               'diagnostics.json')) as f:
            assert json.load(f)['quality_flags'] == s.run_quality_flags
    assert runs['crippled'] < runs['healthy']
    assert runs['crippled'] < 0.7       # the WARNING threshold fires


def test_mixing_ratio_none_for_pure_rejection(tmp_path):
    """Rejection-only runs draw every candidate fresh — no chain kernel
    runs, so the mixing flag must stay None (and diagnostics.json says so)
    rather than reporting a vacuous 0 or 1."""
    like = Gaussian(2, 0.0, lim=3)
    s = NestedSampler(2, like, transform=lambda x: 3 * x,
                      num_live_points=100,
                      log_dir=str(tmp_path / 'rej'),
                      append_run_num=False, resume=False, seed=3)
    s.run(train_iters=50, dlogz=0.5,
          strategy=['rejection_prior', 'rejection_flow'])
    assert s.mixing_min_ratio is None


def test_nested_run_reports_uniform_insertion(tmp_path):
    """A well-mixed 2-D Gaussian run must produce uniform insertion ranks
    (p not tiny), one rank per iteration, the saved artifact, and the
    diagnostic must survive kill-and-resume bit-exactly."""
    like = Gaussian(2, 0.0, lim=3)
    kw = dict(train_iters=50, log_interval=50, dlogz=0.1)
    sA = NestedSampler(2, like, transform=lambda x: 3 * x,
                       num_live_points=100,
                       log_dir=str(tmp_path / 'full'),
                       append_run_num=False, resume=True, seed=7)
    sA.run(**kw)
    assert sA.insertion_ranks.size == sA.niter - 1
    assert sA.insertion_ranks.min() >= 0
    assert sA.insertion_ranks.max() < 100
    # an exact sampler fails this with probability ~1e-3 per seed; seed 7
    # is pinned so the test is deterministic
    assert sA.insertion_p_value > 1e-3
    rpath = os.path.join(sA.log_dir, 'results', 'insertion_ranks.npy')
    saved = np.load(rpath)
    assert np.array_equal(saved, sA.insertion_ranks)
    # bootstrap sampling error calibrates against the analytic bar on a
    # well-mixed run (measured 0.99-1.01 on this config; generous band)
    assert sA.logzerr_bootstrap is not None
    assert 0.5 < sA.logzerr_bootstrap / sA.logzerr < 2.0
    import json
    with open(os.path.join(sA.log_dir, 'results',
                           'diagnostics.json')) as f:
        diag = json.load(f)
    assert diag['insertion_p'] == sA.insertion_p_value
    assert diag['logzerr_bootstrap'] == sA.logzerr_bootstrap

    # kill-and-resume: the rank history must continue, not restart
    sB = NestedSampler(2, like, transform=lambda x: 3 * x,
                       num_live_points=100,
                       log_dir=str(tmp_path / 'killed'),
                       append_run_num=False, resume=True, seed=7)
    sB.run(max_iters=120, **kw)
    sC = NestedSampler(2, like, transform=lambda x: 3 * x,
                       num_live_points=100,
                       log_dir=str(tmp_path / 'killed'),
                       append_run_num=False, resume=True, seed=99)
    sC.run(**kw)
    assert np.array_equal(sC.insertion_ranks, sA.insertion_ranks)
    assert sC.insertion_p_value == sA.insertion_p_value
    # thread ids survive resume too, so the bootstrap error is identical
    assert sC.logzerr_bootstrap == sA.logzerr_bootstrap


def test_mix_ratio_eig_isolates_rotated_ridge():
    """Eigenbasis start-decorrelation (kernels.mix_moments_device device
    moments + evaluation.eig_mix_from_moments host eigh): a frozen slow
    mode that is NOT axis-aligned must collapse the eigenbasis minimum
    while the coordinate-basis minimum blends it with the fast
    directions (the 30-D-Gaussian-vs-20-D-banana confound measured in
    BENCHMARKS.md round 4). Also pins the latent condition-number
    output against the known anisotropy."""
    import jax.numpy as jnp
    from nnest_tpu.samplers.kernels import (mix_moments_device,
                                            mix_ratio_device)
    from nnest_tpu.utils.evaluation import eig_mix_from_moments
    rng = np.random.RandomState(0)
    d, n = 6, 4096
    scales = np.ones(d)
    scales[0] = 12.0                      # one long (ridge) direction
    q, _ = np.linalg.qr(rng.normal(size=(d, d)))   # random rotation
    draw = lambda: (rng.normal(size=(n, d)) * scales) @ q.T
    z0 = draw()
    # endpoints: fresh everywhere EXCEPT frozen along the ridge
    ridge = np.outer(q[:, 0], q[:, 0])
    z_end = z0 @ ridge.T + draw() @ (np.eye(d) - ridge).T
    f32 = lambda a: jnp.asarray(a, jnp.float32)

    def eig_stats(ze):
        cov, msd = mix_moments_device(f32(ze), f32(z0))
        return eig_mix_from_moments(np.asarray(cov), np.asarray(msd))

    r_coord = float(mix_ratio_device(f32(z_end), f32(z0)))
    r_eig, cond = eig_stats(z_end)
    # eigenbasis sees the frozen ridge (~0); coordinates blend it with
    # the d-1 mixed directions and report a much larger minimum
    assert r_eig < 0.02
    assert r_coord > 5 * max(r_eig, 1e-6)
    assert abs(cond - 144.0) / 144.0 < 0.2   # lambda_max/min = 12^2
    # healthy endpoints: both statistics ~1, condition number unchanged
    r_eig_h, cond_h = eig_stats(draw())
    assert 0.8 < r_eig_h < 1.25
    assert abs(cond_h - 144.0) / 144.0 < 0.2


def test_adjusted_logzerr_law():
    """The calibrated max(1/R^2, cond_rel) inflation
    (utils.evaluation.adjusted_logzerr): clipped to [1, 100], medians
    over generations, applied only inside the x_dim >= 8 calibration
    domain, raw bar when no chain kernel ran."""
    from nnest_tpu.utils.evaluation import adjusted_logzerr
    assert adjusted_logzerr(0.3, [], 20) == 0.3            # pure rejection
    assert adjusted_logzerr(0.3, [0.5], 2) == 0.3          # low-D gate
    assert abs(adjusted_logzerr(0.3, [0.5], 20) - 1.2) < 1e-12
    assert abs(adjusted_logzerr(0.3, [0.4, 0.5, 0.6], 20) - 1.2) < 1e-12
    assert adjusted_logzerr(0.3, [1e-4], 20) == 30.0       # 100x cap
    assert adjusted_logzerr(0.3, [1.5], 8) == 0.3          # never deflates
    # structural term: larger of the two inflations wins
    assert abs(adjusted_logzerr(0.3, [0.5], 20, cond_rels=[3.0])
               - 0.3 * 4.0) < 1e-12                        # kinetic wins
    assert abs(adjusted_logzerr(0.3, [1.0], 20, cond_rels=[3.0])
               - 0.9) < 1e-12                              # structural wins
    assert adjusted_logzerr(0.3, [1.0], 20, cond_rels=[0.5]) == 0.3
    assert adjusted_logzerr(0.3, [1.0], 20, cond_rels=[500.0]) == 30.0
    # structural term alone never applies without a kinetic history
    # (no chain kernel ran -> raw bar)
    assert adjusted_logzerr(0.3, [], 20, cond_rels=[5.0]) == 0.3
    assert adjusted_logzerr(0.3, [1.0], 2, cond_rels=[5.0]) == 0.3


def test_latent_cond_null_and_cov_null():
    """Healthy-run structural/kinetic nulls (BENCHMARKS.md rounds 4-5):
    latent_cond_null is the Marchenko-Pastur edge-ratio^1.25 fit to the
    measured healthy Gaussian controls at 256 chains; the cov-adapted
    Metropolis null is the iso null scaled to the cov controls."""
    from nnest_tpu.utils.evaluation import (latent_cond_null,
                                            metropolis_mix_null)
    # measured healthy medians @256 chains (part-2 trained-flow controls:
    # g10 2.42, g30 5.75, g50 11.36 — rels 0.89/0.97/1.06 vs the null)
    assert abs(latent_cond_null(10, 256) - 2.42) < 0.5
    assert abs(latent_cond_null(30, 256) - 5.75) < 0.9
    assert abs(latent_cond_null(50, 256) - 11.36) < 1.7
    # measured rb20 structural excess: cond 14-18.5 -> rel 3.3-4.4
    assert 3.0 < 14.0 / latent_cond_null(20, 256) < 5.0
    # monotone in dim, degrades gracefully when chains <= dim
    assert latent_cond_null(50, 256) > latent_cond_null(10, 256)
    assert np.isfinite(latent_cond_null(300, 256))
    # cov-null control points (round-5 part-2 production-default Gaussian
    # cov controls — red-black covariance + trained flows: g10 0.689 @50
    # steps, g30 0.459 @150, g50 0.398 @250)
    assert abs(metropolis_mix_null(50, 10, adapt_cov=True) - 0.689) < 0.02
    assert abs(metropolis_mix_null(150, 30, adapt_cov=True) - 0.459) < 0.02
    assert abs(metropolis_mix_null(250, 50, adapt_cov=True) - 0.398) < 0.02
    # cov null >= iso null at every budget for d >= 20 (the cov proposal
    # mixes faster on the same healthy controls; at 10-D the latent cloud
    # is already near-isotropic and the two laws coincide within 2%)
    for d in (10, 20, 30, 50):
        for steps in (2, 5 * d, 20 * d):
            iso = metropolis_mix_null(steps, d)
            cov = metropolis_mix_null(steps, d, adapt_cov=True)
            assert 0.0 < iso <= 1.0 and 0.0 < cov <= 1.0
            if d >= 20:
                assert cov >= iso
            else:
                assert cov >= 0.98 * iso
