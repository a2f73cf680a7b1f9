"""Dynamic nested sampling (samplers/dynamic.py): batch mechanics and the
end-to-end claim — same evidence as static NS, better posterior ESS per
likelihood call when live points are allocated where the posterior mass is
(Higson et al. 2019). Beyond the reference (static runs only,
``nnest/nested.py``)."""

import math
import os

import numpy as np
import pytest

from nnest_tpu import DynamicNestedSampler, NestedSampler
from nnest_tpu.likelihoods import Gaussian
from nnest_tpu.utils.evaluation import merge_runs, thread_birth_logl


def _analytic_logz(d, lim):
    return d * (math.log(math.erf(lim / math.sqrt(2.0)))
                - math.log(2.0 * lim))


def test_batch_floor_ceiling_mechanics(tmp_path):
    """A floored+ceilinged batch run: records the birth floor in
    threads.npz, seeds from the supplied live set without re-evaluating,
    and terminates once every live point exceeds the ceiling."""
    like = Gaussian(2, 0.0, lim=3)
    s0 = NestedSampler(2, like, transform=lambda x: 3 * x,
                       num_live_points=100,
                       log_dir=str(tmp_path / 'base'), resume=False, seed=1)
    s0.run(train_iters=50, dlogz=0.3, mcmc_num_chains=16)
    assert s0.saved_u is not None
    assert s0.saved_u.shape == (s0.loglikes.size, 2)

    # live-at-threshold reconstruction: pick the median death as the floor
    births = thread_birth_logl(s0.loglikes, s0.thread_slots,
                               s0.num_live_points)
    floor = float(np.median(s0.loglikes))
    alive = (births <= floor) & (s0.loglikes > floor)
    assert alive.sum() >= 50      # ~nlive points straddle any threshold

    idx = np.nonzero(alive)[0][:50]
    ceiling = float(np.quantile(s0.loglikes, 0.9))
    s1 = NestedSampler(2, like, transform=lambda x: 3 * x,
                       num_live_points=50,
                       log_dir=str(tmp_path / 'batch'), resume=False,
                       seed=2, trainer=s0.trainer)
    # dlogz tiny so the ceiling is the binding termination criterion
    s1.run(train_iters=50, dlogz=1e-3, mcmc_num_chains=16,
           strategy=['mcmc'],
           init_points={'u': s0.saved_u[idx],
                        'logl': s0.loglikes[idx]},
           birth_floor=floor, logl_ceiling=ceiling)
    # every recorded death in (floor, +inf); the run crossed the ceiling
    assert np.all(s1.loglikes > floor)
    assert np.min(s1.loglikes[-s1.num_live_points:]) > ceiling
    rec = np.load(os.path.join(s1.logs['results'], 'threads.npz'))
    assert float(rec['birth_floor']) == floor
    # merged evidence over base+batch is finite and close to the base run
    merged = merge_runs([
        {'logl': s0.loglikes,
         'birth_logl': births},
        {'logl': s1.loglikes,
         'birth_logl': thread_birth_logl(
             s1.loglikes, s1.thread_slots, s1.num_live_points,
             birth_floor=floor)},
    ])
    assert abs(merged['logz'] - s0.logz) < 5 * s0.logzerr + 0.2


def test_init_points_rejects_resumable_checkpoint(tmp_path):
    like = Gaussian(2, 0.0, lim=3)
    s = NestedSampler(2, like, transform=lambda x: 3 * x,
                      num_live_points=50,
                      log_dir=str(tmp_path / 'r'), append_run_num=False,
                      resume=False, seed=1)
    s.run(train_iters=50, dlogz=0.5, mcmc_num_chains=8, max_iters=30)
    s2 = NestedSampler(2, like, transform=lambda x: 3 * x,
                       num_live_points=50,
                       log_dir=str(tmp_path / 'r'), append_run_num=False,
                       resume=True, seed=1)
    with pytest.raises(ValueError, match='init_points'):
        s2.run(train_iters=50, dlogz=0.5,
               init_points={'u': np.zeros((50, 2)),
                            'logl': np.zeros(50)})


def test_dynamic_vs_static_10d(tmp_path):
    """The headline claim on a 10-D Gaussian in a wide box (substantial
    compression phase): dynamic batches targeted at the posterior bulk
    (G=1) give the same evidence with strictly better posterior ESS per
    likelihood call, and the live-point allocation actually peaks above
    the initial count."""
    D, LIM = 10, 10
    s = NestedSampler(D, Gaussian(D, 0.0, lim=LIM),
                      transform=lambda x: LIM * x, num_live_points=100,
                      log_dir=str(tmp_path / 'static'), seed=3)
    s.run(dlogz=0.3, train_iters=50, mcmc_num_chains=16)
    w = s.weights
    ess_static = float(np.sum(w) ** 2 / np.sum(w ** 2))

    d = DynamicNestedSampler(D, Gaussian(D, 0.0, lim=LIM),
                             transform=lambda x: LIM * x,
                             num_live_init=100,
                             log_dir=str(tmp_path / 'dyn'), seed=3)
    d.run(G=1.0, num_batches=4, num_live_batch=50, dlogz=0.3,
          train_iters=50, mcmc_num_chains=16)

    analytic = _analytic_logz(D, LIM)
    assert abs(d.logz - analytic) < 5 * d.logzerr + 0.3
    assert abs(d.logz - s.logz) < 5 * (d.logzerr + s.logzerr)
    # allocation targeted the bulk: live counts peak above the static 100
    assert int(np.max(d.n_live)) > 100
    # the point of dynamic NS: more posterior ESS per likelihood call
    assert (d.posterior_ess / d.total_calls
            > ess_static / s.total_calls), (
        d.posterior_ess, d.total_calls, ess_static, s.total_calls)
    # artifact contract: merged chain + final.csv in the driver's run dir
    assert os.path.exists(os.path.join(d.logs['results'], 'final.csv'))
    assert os.path.exists(os.path.join(d.logs['chains'], 'chain.txt'))


def _final(d):
    return (d.logz, d.h, d.total_calls, d.niter)


def _mk_dyn(tmp_path, tag, resume):
    return DynamicNestedSampler(
        2, Gaussian(2, 0.0, lim=3), transform=lambda x: 3 * x,
        num_live_init=100, log_dir=str(tmp_path / tag),
        append_run_num=False, resume=resume, seed=3)


_DYN_KW = dict(G=0.5, num_live_batch=50, dlogz=0.3, train_iters=50,
               mcmc_num_chains=16, log_interval=20)


def test_dynamic_resume_between_batches(tmp_path):
    """Stopping after batch k and resuming with more batches equals the
    uninterrupted run EXACTLY: the dynamic_state.pkl bundle carries the
    ingested parts, the batch-seed RNG state and the shared trainer, so
    batch k+1 sees identical inputs either way (this is also the
    dynesty-style 'add more batches later' workflow)."""
    a = _mk_dyn(tmp_path, 'uninterrupted', resume=False)
    a.run(num_batches=2, **_DYN_KW)

    b = _mk_dyn(tmp_path, 'resumed', resume=True)
    b.run(num_batches=1, **_DYN_KW)
    b2 = _mk_dyn(tmp_path, 'resumed', resume=True)
    b2.run(num_batches=2, **_DYN_KW)
    assert _final(b2) == _final(a)
    # merged diagnostics artifact
    diag = os.path.join(b2.logs['results'], 'diagnostics.json')
    assert os.path.exists(diag)
    import json
    rec = json.load(open(diag))
    assert rec['sampler'] == 'dynamic'
    assert len(rec['batches']) == 3
    assert rec['logz'] == pytest.approx(b2.logz)


def test_dynamic_exact_resume_mid_batch(tmp_path, monkeypatch):
    """A crash in the MIDDLE of batch 1 (emulated: max_iters truncation —
    which leaves exactly a crash's checkpoint state — then an exception
    before ingest) resumes to the exact uninterrupted result: the batch
    continues from its own exact checkpoint, the replayed host-RNG seed
    draw keeps later batches on the identical stream."""
    import nnest_tpu.samplers.dynamic as dyn

    a = _mk_dyn(tmp_path, 'uninterrupted', resume=False)
    a.run(num_batches=2, **_DYN_KW)

    orig_run = dyn.NestedSampler.run
    calls = {'n': 0}

    def crashing_run(self, *args, **kw):
        calls['n'] += 1
        if calls['n'] == 2:          # batch 1
            kw['max_iters'] = 40
            orig_run(self, *args, **kw)
            raise KeyboardInterrupt('emulated mid-batch kill')
        return orig_run(self, *args, **kw)

    with monkeypatch.context() as m:
        m.setattr(dyn.NestedSampler, 'run', crashing_run)
        killed = _mk_dyn(tmp_path, 'killed', resume=True)
        with pytest.raises(KeyboardInterrupt):
            killed.run(num_batches=2, **_DYN_KW)

    # resume with a DIFFERENT constructor seed for the driver? No — the
    # dynamic driver's seed feeds the batch samplers' constructor seeds,
    # which matter for NOT-yet-started batches; pass the same arguments
    # (the NestedSampler resume contract).
    res = _mk_dyn(tmp_path, 'killed', resume=True)
    res.run(num_batches=2, **_DYN_KW)
    assert _final(res) == _final(a)
