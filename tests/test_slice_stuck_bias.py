"""Slice shrinkage runs to acceptance — no stuck-lane bias (VERDICT r4 #5).

Pre-round-5, shrinkage truncated at ``max_shrink`` halvings and left
unaccepted lanes in place (a measured ~0.9% per-lane-step stay-put bias on
adversarial thin shells). The round-5 kernel runs shrinkage to acceptance
(the bracket collapses onto the current point, which the ``>=`` height test
accepts — Neal's shrinkage limit), so these tests now assert NO unaccepted
lanes on the adversarial worst case at every shrink budget, plus the
end-to-end evidence A/B that the budget no longer matters. Protects the
within-shell-uniform invariant the reference's Metropolis kernel relies on
(``nnest/sampler.py:299-370``).
"""

import jax
import numpy as np

from nnest_tpu import NestedSampler
from nnest_tpu.likelihoods import GaussianShell


def test_no_stuck_lanes_adversarial_shell(tmp_path):
    """Thin 8-D shell (width 0.05 in x), untrained flow, default width:
    every lane-step must accept (rejected == 0) at the default shrink
    budget and at 2x — the run-to-acceptance loop leaves no lane behind
    where the old truncation measured a 0.93% stuck fraction."""
    D = 8
    like = GaussianShell(D, sigma=0.05, rshell=2)
    s = NestedSampler(D, like, transform=lambda x: 3 * x,
                      num_live_points=50, log_dir=str(tmp_path / 'adv'),
                      resume=False, seed=3)
    s.trainer.ensure_init()
    params = s.trainer.params
    rng = np.random.RandomState(0)
    n, steps = 256, 16
    d0 = rng.normal(size=(n, D))
    d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
    x0u = (2.0 / 3.0) * d0            # u radius 2/3 -> x radius 2 (peak)
    z0, _ = s.trainer._forward(params, np.asarray(x0u, np.float32))
    logl0, _ = s.loglike(np.asarray(x0u))
    loglstar = -0.5                    # |r - 2| <= sigma: thin shell
    assert np.all(logl0 > loglstar)

    def rejected_fraction(ms):
        out = s.kernels.slice_(params, jax.random.PRNGKey(9),
                               np.asarray(z0, np.float32),
                               np.asarray(logl0, np.float32),
                               np.zeros((n, 0), np.float32),
                               loglstar=loglstar, width=1.0,
                               slice_steps=steps, max_shrink=ms)
        assert bool(np.all(np.asarray(out['moved'])))
        # run-to-acceptance: final points must still satisfy the shell
        logl_f, _ = s.loglike(np.asarray(out['final_x']))
        assert np.all(logl_f > loglstar)
        return int(out['rejected']) / (steps * n)

    assert rejected_fraction(10) == 0.0
    assert rejected_fraction(20) == 0.0


def test_stuck_bias_evidence_negligible(tmp_path):
    """Same-seed 4-D shell runs at max_shrink 10 vs 20: the shrink budget
    is now only a safety-cap offset, but the two runs still take different
    accept decisions only if any lane would need >50 halvings (never in
    practice) — the evidence must agree far inside 0.1 x logzerr."""
    res = {}
    for ms in (10, 20):
        like = GaussianShell(4, sigma=0.1, rshell=2)
        s = NestedSampler(4, like, transform=lambda x: 3 * x,
                          num_live_points=100,
                          log_dir=str(tmp_path / ('ms%d' % ms)),
                          resume=False, seed=0)
        s.run(strategy=['rejection_prior', 'slice'], train_iters=100,
              dlogz=0.3, slice_max_shrink=ms, mcmc_num_chains=16)
        res[ms] = (s.logz, s.logzerr)
    dlogz = abs(res[10][0] - res[20][0])
    assert dlogz < 0.1 * res[10][1], (res, dlogz)
