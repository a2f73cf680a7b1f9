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
import json
import logging
import os

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
    (final.csv / chain.txt / params.txt) with each batch's full artifact
    tree under ``batches/``.
    """

    def __init__(self,
                 x_dim,
                 loglike,
                 transform=None,
                 num_live_init=500,
                 log_dir='logs/dynamic',
                 append_run_num=True,
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
        self.sampler = 'dynamic'

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

    # ------------------------------------------------------------ batches

    def _make_sampler(self, num_live, tag, seed):
        sub_dir = (os.path.join(self.logs['run_dir'], 'batches', tag)
                   if self.logs is not None else None)
        s = NestedSampler(
            self.x_dim, self._loglike, transform=self._transform,
            num_live_points=num_live,
            log_dir=sub_dir, append_run_num=False, resume=False,
            seed=seed, mesh=self._mesh, trainer=self._trainer,
            log_level=max(self._log_level, logging.WARNING),
            **self._sampler_kwargs)
        if self._trainer is None:
            self._trainer = s.trainer
        self._batch_samplers.append(s)
        return s

    def _ingest(self, s):
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
        }
        self._parts.append(part)
        self.total_calls += int(s.total_calls)
        self.niter += int(s.niter)
        return part

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

    def _seed_batch(self, s, L_lo, num_live, mcmc_steps):
        """Initial live points for a batch above ``L_lo``: draw starts
        from the union of points alive at L_lo across existing runs, then
        refresh through the constrained Metropolis kernel at
        loglstar = L_lo (decorrelates the with-replacement draws; the
        kernel leaves the uniform-in-{logl > L_lo} distribution
        invariant)."""
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
        """
        num_live_batch = int(num_live_batch or
                             max(50, self.num_live_init // 5))
        if seed_mcmc_steps <= 0:
            seed_mcmc_steps = run_kwargs.get('mcmc_steps', 0) or \
                5 * self.x_dim

        s0 = self._make_sampler(self.num_live_init, 'batch0', self._seed)
        s0.run(dlogz=dlogz, **run_kwargs)
        self._ingest(s0)
        self.logger.info(
            'Dynamic batch 0 (static, %d live): logz %.3f ncall %d'
            % (self.num_live_init, s0.logz, s0.total_calls))

        for b in range(1, int(num_batches) + 1):
            merged = merge_runs(self._parts)
            L_lo, L_hi = self.batch_bounds(merged, self._parts, G=G,
                                           maxfrac=maxfrac)
            s = self._make_sampler(num_live_batch, 'batch%d' % b,
                                   self._seed + 7919 * b)
            batch_kwargs = dict(run_kwargs)
            if np.isfinite(L_lo):
                init_points = self._seed_batch(s, L_lo, num_live_batch,
                                               seed_mcmc_steps)
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
            self._ingest(s)
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

        if self.logs is not None:
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
