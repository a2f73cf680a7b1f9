"""Dynamic nested sampling: allocate live points where they matter.

Beyond the reference (static runs only, ``nnest/nested.py:24-510``): the
dynamic scheme of Higson et al. 2019 (arXiv:1704.03459) runs a small
static pass first, then repeatedly adds batches of live points over the
likelihood range that dominates the current evidence/posterior
uncertainty. The combined run has varying live counts n(L); its evidence
is recomputed from the per-point (birth, death) representation — exactly
the machinery this repo already ships for cross-run merging
(``utils/evaluation.merged_run_evidence`` / ``merge_runs``,
``analyse.py --merge``).

Batch mechanics, mapped onto the existing TPU kernels:

- A batch above likelihood floor L_lo needs initial live points uniform
  in {logl > L_lo}. The union over existing runs of points alive at L_lo
  (birth <= L_lo < death) is exactly such a set (the standard NS
  invariant); we draw starting points from it and refresh them through
  the constrained latent-Metropolis kernel at loglstar = L_lo
  (``Sampler._mcmc_sample_final``) — the same within-shell move that
  drives every nested iteration.
- The batch itself is an ordinary ``NestedSampler`` run with
  ``init_points`` / ``birth_floor`` / ``logl_ceiling`` (it stops once all
  its live points exceed L_hi); its final live points enter the merged
  representation as ramp-down deaths (the nestcheck/dynesty tail
  convention, handled by ``merged_run_evidence``).
- All batches share one ``Trainer`` (one flow): retrains are gated by the
  live-set NLL exactly as in static runs, so a batch over territory the
  flow already fits costs no training.

The importance function and [L_lo, L_hi] selection follow dynesty's
``weight_function``: I(i) = (1-G)·Z_remain(i)/max + G·w_i/max with the
batch spanning {i : I(i) > maxfrac·max I} padded by one point; G=0 targets
evidence precision, G=1 posterior precision.
"""

from __future__ import annotations

import csv
import glob
import json
import logging
import os
import pickle

import numpy as np

from nnest_tpu.samplers.nested import NestedSampler
from nnest_tpu.utils.evaluation import (merge_runs, thread_birth_logl)
from nnest_tpu.utils.logger import create_logger, get_or_create_run_dir


class DynamicNestedSampler:
    """Driver for dynamic nested sampling over ``NestedSampler`` batches.

    Constructor arguments mirror ``NestedSampler`` (they are forwarded to
    every batch sampler); ``num_live_init`` is the initial static pass's
    live-point count, batches default to ``max(50, num_live_init // 5)``.
    After ``run()``: ``logz``, ``logzerr``, ``h``, ``samples``,
    ``weights``, ``loglikes``, ``n_live`` (per-death live counts),
    ``total_calls``. Artifacts follow the standard run-dir contract
    (final.csv / chain.txt / params.txt / results/diagnostics.json) with
    each batch's full artifact tree under ``batches/``.

    Checkpoint/resume (round 5; VERDICT r4 item 3): with
    ``resume=True`` (requires ``append_run_num=False`` so the run dir is
    pinned) the driver persists an atomic cross-batch state bundle
    (``checkpoint/dynamic_state.pkl``: ingested parts, host batch-seed
    RNG state, call/iteration counters, shared-flow params + trainer
    state) after every completed batch, and each batch sampler runs with
    its own bit-exact ``exact_state`` machinery enabled. A kill at ANY
    point — between batches or mid-batch — resumes to the exact
    uninterrupted result: completed batches are replayed from the
    bundle, the in-flight batch from its own exact checkpoint (the
    batch-seed RNG draw is replayed so later batches see the identical
    stream; the seed-refresh kernel is skipped because the batch's
    checkpoint already contains its post-seed key and counters).
    """

    def __init__(self,
                 x_dim,
                 loglike,
                 transform=None,
                 num_live_init=500,
                 log_dir='logs/dynamic',
                 append_run_num=True,
                 resume=False,
                 seed=0,
                 mesh=None,
                 log_level=logging.INFO,
                 **sampler_kwargs):
        self.x_dim = x_dim
        self.num_live_init = int(num_live_init)
        self._loglike = loglike
        self._transform = transform
        self._seed = int(seed)
        self._mesh = mesh
        self._sampler_kwargs = dict(sampler_kwargs)
        self._log_level = log_level
        self._resume = bool(resume)
        self.sampler = 'dynamic'
        if self._resume and append_run_num:
            raise ValueError('resume=True needs append_run_num=False so '
                             'the run dir (and its checkpoint) is pinned')

        self.logs = (get_or_create_run_dir(log_dir, append_run_num)
                     if log_dir is not None else None)
        self.logger = create_logger(__name__, level=log_level)
        if self.logs is not None:
            with open(os.path.join(self.logs['info'], 'params.txt'),
                      'w') as f:
                json.dump({'x_dim': x_dim, 'sampler': 'dynamic',
                           'num_live_points': self.num_live_init,
                           'seed': seed}, f)

        # Host RNG for batch-seed selection: seeded, so identically-
        # configured processes make identical draws (multi-process
        # lockstep mirrors the batch samplers' own host-side decisions).
        self._rng = np.random.RandomState(seed)
        self._parts = []          # per-batch {logl, birth_logl, u, samples}
        self._batch_samplers = []
        self._trainer = None      # shared flow across batches
        self._pending_trainer_state = None  # from a resume bundle

        # populated by run()
        self.logz = None
        self.logzerr = None
        self.h = None
        self.samples = None
        self.weights = None
        self.loglikes = None
        self.n_live = None
        self.total_calls = 0
        self.niter = 0
        self.insertion_p_value = None

    # ------------------------------------------------------------ batches

    def _make_sampler(self, num_live, tag, seed):
        sub_dir = (os.path.join(self.logs['run_dir'], 'batches', tag)
                   if self.logs is not None else None)
        s = NestedSampler(
            self.x_dim, self._loglike, transform=self._transform,
            num_live_points=num_live,
            log_dir=sub_dir, append_run_num=False, resume=self._resume,
            seed=seed, mesh=self._mesh, trainer=self._trainer,
            log_level=max(self._log_level, logging.WARNING),
            **self._sampler_kwargs)
        if self._trainer is None:
            self._trainer = s.trainer
        if self._pending_trainer_state is not None:
            # Cross-batch flow/trainer state from the resume bundle; bound
            # once the shared trainer exists. An in-flight batch's own
            # exact checkpoint (newer) overrides this inside s.run().
            flow_params, tr_state = self._pending_trainer_state
            if flow_params is not None:
                self._trainer.load_params(flow_params)
                if tr_state is not None:
                    self._trainer.restore_state(tr_state)
            self._pending_trainer_state = None
        self._batch_samplers.append(s)
        return s

    def _batch_has_checkpoint(self, s):
        """True when this batch's run dir holds a resumable checkpoint —
        the batch crashed (or was killed) mid-run, or completed without
        its ingest reaching the bundle. Either way ``s.run()`` must
        continue from that checkpoint (its own bit-exact machinery) and
        the seed-refresh kernel must NOT be re-run: the checkpoint
        already contains the post-seed PRNG key and call counters."""
        if s.logs is None:
            return False
        return bool(glob.glob(os.path.join(
            s.logs['checkpoint'], 'checkpoint_*.txt')))

    def _ingest(self, s, tag):
        """Record a finished batch in (birth, death) representation."""
        if s.saved_u is None or s.thread_slots is None:
            raise RuntimeError('batch run did not record saved_u/threads')
        logl = np.asarray(s.loglikes, np.float64)
        part = {
            'logl': logl,
            'birth_logl': thread_birth_logl(
                logl, s.thread_slots, s.num_live_points,
                birth_floor=s._birth_floor),
            'u': np.asarray(s.saved_u, np.float64),
            'samples': np.asarray(s.samples, np.float64),
            # merged-run diagnostics metadata (merge_runs ignores it)
            'tag': tag,
            'logz': float(s.logz),
            'logzerr': float(s.logzerr),
            'ncall': int(s.total_calls),
            'insertion_p': (None if s.insertion_p_value is None
                            else float(s.insertion_p_value)),
        }
        self._parts.append(part)
        self.total_calls += int(s.total_calls)
        self.niter += int(s.niter)
        self._save_state()
        return part

    # ------------------------------------------------- checkpoint bundle

    def _state_path(self):
        return (None if self.logs is None else
                os.path.join(self.logs['checkpoint'], 'dynamic_state.pkl'))

    def _save_state(self):
        """Atomic cross-batch bundle written after every ingested batch
        (tmp + os.replace — a mid-write crash leaves the previous bundle,
        and the newer batch simply replays from its own run dir). Only
        written when ``resume=True``: without it no future invocation can
        find the pinned dir, and the bundle grows O(total saved points)
        per batch — dead-weight synchronous IO otherwise."""
        path = self._state_path()
        if path is None or not self._resume:
            return
        trainer_ready = (self._trainer is not None
                         and self._trainer.params is not None)
        bundle = {
            'version': 1,
            'completed_batches': len(self._parts),
            'parts': self._parts,
            'rng_state': self._rng.get_state(),
            'total_calls': int(self.total_calls),
            'niter': int(self.niter),
            'flow_params': (self._trainer.host_params()
                            if trainer_ready else None),
            'trainer_state': (self._trainer.snapshot_state()
                              if trainer_ready else None),
        }
        tmp = path + '.tmp'
        with open(tmp, 'wb') as f:
            pickle.dump(bundle, f)
        os.replace(tmp, path)

    def _load_state(self):
        path = self._state_path()
        if path is None or not os.path.exists(path):
            return None
        with open(path, 'rb') as f:
            return pickle.load(f)

    @staticmethod
    def batch_bounds(merged, parts, G=0.25, maxfrac=0.8):
        """dynesty-style importance window for the next batch.

        Returns ``(L_lo, L_hi)``: ``L_lo = -inf`` means seed from the
        prior; ``L_hi = None`` means the batch runs to its own dlogz
        termination (the window reaches the current maximum likelihood).
        """
        logl = np.concatenate([p['logl'] for p in parts])
        order = merged['order']
        logl_s = logl[order]
        logwt_s = np.asarray(merged['logwt'], np.float64)[order]
        # Z_remain(i) = logsumexp(logwt[i:]) via a reversed accumulate.
        logz_remain = np.logaddexp.accumulate(logwt_s[::-1])[::-1]
        zimp = np.exp(logz_remain - logz_remain[0])          # 1 -> 0
        pimp = np.exp(logwt_s - np.max(logwt_s))             # max 1
        imp = (1.0 - G) * zimp + G * pimp
        sel = np.nonzero(imp > maxfrac * float(np.max(imp)))[0]
        lo, hi = int(sel[0]), int(sel[-1])
        # pad by one point on each side (dynesty's convention) so the
        # batch brackets the window rather than starting exactly on it
        L_lo = -np.inf if lo <= 1 else float(logl_s[lo - 1])
        L_hi = (None if hi >= logl_s.size - 2
                else float(logl_s[min(hi + 1, logl_s.size - 1)]))
        return L_lo, L_hi

    def _seed_batch(self, s, L_lo, num_live, mcmc_steps, refresh=True):
        """Initial live points for a batch above ``L_lo``: draw starts
        from the union of points alive at L_lo across existing runs, then
        refresh through the constrained Metropolis kernel at
        loglstar = L_lo (decorrelates the with-replacement draws; the
        kernel leaves the uniform-in-{logl > L_lo} distribution
        invariant).

        ``refresh=False`` (resume path, batch has its own checkpoint):
        only the host-RNG index draw is replayed — it must consume
        ``self._rng`` exactly as the uninterrupted run did so LATER
        batches see the identical stream — while the kernel refresh is
        skipped (the batch checkpoint already holds the post-seed
        sampler key and call counters). Returns None in that case."""
        pool_u, pool_logl, pool_derived = [], [], []
        nd = s.num_derived
        for p in self._parts:
            alive = (p['birth_logl'] <= L_lo) & (p['logl'] > L_lo)
            # strict f32 margin: the device kernels compare f32(logl) >
            # f32(loglstar); a seed equal at f32 would stall its chain
            alive &= (p['logl'].astype(np.float32)
                      > np.float32(L_lo))
            pool_u.append(p['u'][alive])
            pool_logl.append(p['logl'][alive])
            pool_derived.append(p['samples'][alive][:, s.x_dim:]
                                if nd > 0 else
                                np.zeros((int(alive.sum()), 0)))
        pool_u = np.concatenate(pool_u)
        pool_logl = np.concatenate(pool_logl)
        pool_derived = np.concatenate(pool_derived)
        if pool_u.shape[0] == 0:
            raise RuntimeError('no live-at-threshold points above L_lo='
                               '%r to seed the batch' % L_lo)
        idx = self._rng.randint(0, pool_u.shape[0], size=num_live)
        if not refresh:
            return None
        u, logl, derived, _moved, _sc, _mj, _nc = s._mcmc_sample_final(
            mcmc_steps,
            init_samples=pool_u[idx],
            init_loglikes=pool_logl[idx],
            init_derived=pool_derived[idx],
            loglstar=float(L_lo),
            dynamic_step_size=True)
        return {'u': u, 'v': np.asarray(s.transform(u), np.float64),
                'logl': logl, 'derived': derived}

    # ---------------------------------------------------------------- run

    def run(self,
            G=0.25,
            num_batches=4,
            num_live_batch=None,
            maxfrac=0.8,
            dlogz=0.5,
            seed_mcmc_steps=0,
            **run_kwargs):
        """Initial static pass + ``num_batches`` importance-targeted
        batches, then the merged combined-run evidence.

        ``G``: evidence(0) <-> posterior(1) importance trade-off.
        ``run_kwargs`` are forwarded to every batch's
        ``NestedSampler.run`` (strategy, mcmc_steps, train_iters, ...).

        With ``resume=True`` (constructor) a previous invocation's state
        is continued: completed batches come from the atomic
        ``dynamic_state.pkl`` bundle, the in-flight batch from its own
        exact checkpoint — the finished run equals the uninterrupted one
        (tests/test_dynamic.py::test_dynamic_exact_resume). Pass the
        SAME run arguments when resuming (as with ``NestedSampler``).
        """
        num_live_batch = int(num_live_batch or
                             max(50, self.num_live_init // 5))
        if seed_mcmc_steps <= 0:
            seed_mcmc_steps = run_kwargs.get('mcmc_steps', 0) or \
                5 * self.x_dim

        completed = 0
        if self._resume:
            state = self._load_state()
            if state is not None:
                self._parts = list(state['parts'])
                self._rng.set_state(state['rng_state'])
                self.total_calls = int(state['total_calls'])
                self.niter = int(state['niter'])
                completed = int(state['completed_batches'])
                self._pending_trainer_state = (state['flow_params'],
                                               state['trainer_state'])
                self.logger.info(
                    'Resumed dynamic run: %d batch(es) already ingested'
                    % completed)

        if completed == 0:
            s0 = self._make_sampler(self.num_live_init, 'batch0',
                                    self._seed)
            s0.run(dlogz=dlogz, **run_kwargs)
            self._ingest(s0, 'batch0')
            completed = 1
            self.logger.info(
                'Dynamic batch 0 (static, %d live): logz %.3f ncall %d'
                % (self.num_live_init, s0.logz, s0.total_calls))

        for b in range(completed, int(num_batches) + 1):
            merged = merge_runs(self._parts)
            L_lo, L_hi = self.batch_bounds(merged, self._parts, G=G,
                                           maxfrac=maxfrac)
            s = self._make_sampler(num_live_batch, 'batch%d' % b,
                                   self._seed + 7919 * b)
            batch_kwargs = dict(run_kwargs)
            # A resumable checkpoint in the batch dir means this batch
            # was killed mid-run (or finished without reaching the
            # bundle): continue it from its own exact checkpoint. The
            # seed-refresh kernel is skipped but the host-RNG draw is
            # replayed so later batches see the identical stream.
            has_ckpt = self._batch_has_checkpoint(s)
            if np.isfinite(L_lo):
                init_points = self._seed_batch(s, L_lo, num_live_batch,
                                               seed_mcmc_steps,
                                               refresh=not has_ckpt)
                # Above a likelihood floor, prior-volume rejection is
                # hopeless (acceptance ~ X(L_lo), often 1e-5 and below) —
                # it would burn its whole trial ladder before expiring.
                # Strip the prior phase; within-shell kernels take over
                # immediately.
                st = [m for m in (batch_kwargs.get('strategy')
                                  or ['rejection_prior', 'mcmc'])
                      if m != 'rejection_prior']
                batch_kwargs['strategy'] = st or ['mcmc']
            else:
                init_points = None    # prior-seeded, like a static run
            s.run(dlogz=dlogz, init_points=init_points,
                  birth_floor=(float(L_lo) if np.isfinite(L_lo)
                               else None),
                  logl_ceiling=L_hi, **batch_kwargs)
            self._ingest(s, 'batch%d' % b)
            self.logger.info(
                'Dynamic batch %d (%d live, logl in [%s, %s]): ncall %d'
                % (b, num_live_batch,
                   '%.4g' % L_lo if np.isfinite(L_lo) else '-inf',
                   '%.4g' % L_hi if L_hi is not None else 'max',
                   s.total_calls))

        merged = merge_runs(self._parts)
        self.logz = float(merged['logz'])
        self.h = float(merged['h'])
        self.logzerr = float(merged['logzerr'])
        self.n_live = np.asarray(merged['n_live'])
        self.loglikes = np.concatenate([p['logl'] for p in self._parts])
        self.samples = np.concatenate([p['samples']
                                       for p in self._parts])
        self.weights = np.exp(np.asarray(merged['logwt'], np.float64)
                              - merged['logz'])
        self.logger.info(
            'Dynamic run: logz %.4f +/- %.4f (h %.3f, ncall %d, '
            '%d points, peak n_live %d)'
            % (self.logz, self.logzerr, self.h, self.total_calls,
               self.loglikes.size, int(np.max(self.n_live))))

        # Merged-run insertion diagnostic: each batch's insertion-rank KS
        # p-value is Uniform(0,1) under exact constrained sampling, so
        # Fisher's method combines them into one merged-run p
        # (chi2 with 2k dof on -2 sum log p — the same combination
        # analyse.py applies across seeds).
        pvals = [p['insertion_p'] for p in self._parts
                 if p.get('insertion_p') is not None]
        if pvals:
            from scipy.stats import chi2
            stat = -2.0 * float(np.sum(np.log(np.clip(pvals, 1e-300,
                                                      1.0))))
            self.insertion_p_value = float(chi2.sf(stat, 2 * len(pvals)))
        else:
            self.insertion_p_value = None
        if (self.insertion_p_value is not None
                and self.insertion_p_value < 0.01):
            self.logger.warning(
                'Merged insertion-rank p = %.4g < 0.01: within-shell '
                'sampling may be imperfect in one or more batches'
                % self.insertion_p_value)

        if self.logs is not None:
            with open(os.path.join(self.logs['results'],
                                   'diagnostics.json'), 'w') as f:
                json.dump({
                    'sampler': 'dynamic',
                    'logz': self.logz, 'logzerr': self.logzerr,
                    'h': self.h, 'ncall': int(self.total_calls),
                    'niter': int(self.niter),
                    'posterior_ess': self.posterior_ess,
                    'peak_n_live': int(np.max(self.n_live)),
                    'insertion_p': self.insertion_p_value,
                    'batches': [{
                        'tag': p.get('tag'),
                        'logz': p.get('logz'),
                        'logzerr': p.get('logzerr'),
                        'ncall': p.get('ncall'),
                        'insertion_p': p.get('insertion_p'),
                    } for p in self._parts],
                }, f, indent=1)
            with open(os.path.join(self.logs['results'], 'final.csv'),
                      'w') as f:
                w = csv.writer(f)
                w.writerow(['niter', 'ncall', 'logz', 'logzerr', 'h'])
                w.writerow([self.niter, self.total_calls, self.logz,
                            self.logzerr, self.h])
            rows = np.hstack([self.weights[:, None],
                              -self.loglikes[:, None], self.samples])
            np.savetxt(os.path.join(self.logs['chains'], 'chain.txt'),
                       rows, fmt='%.5E')
            np.save(os.path.join(self.logs['results'], 'n_live.npy'),
                    self.n_live)
        return self.logz

    @property
    def posterior_ess(self):
        w = np.asarray(self.weights, np.float64)
        return float(np.sum(w) ** 2 / np.sum(w ** 2))
