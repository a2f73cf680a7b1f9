"""Nested sampler: evidence (logZ) + posterior samples.

Equivalent of the reference ``NestedSampler`` (``nnest/nested.py:24-510``).
The inherently sequential contraction (worst point → evidence update →
replacement) stays on host in float64 — TPU f32 is insufficient for the late-
iteration logaddexp chains (``nested.py:280-293``) — while every inner
computation (flow training, batched candidate generation via rejection /
density / constrained-Metropolis kernels, likelihood evaluation) is a
compiled device program.

Strategy ladder, evidence/information updates, termination criterion,
checkpoint artifact layout and results/chain files match the reference:
- strategy selection + expiry (``nested.py:295-309``), switch triggers on
  mean likelihood calls per accepted point (``nested.py:328-334,345-348``)
- flow retrain every ``update_interval`` iterations (``nested.py:311-314``)
- candidate-pool consumption across iterations (``nested.py:375-385``,
  ``nested.py:429-439``)
- evidence update and h accumulation (``nested.py:280-293``), shrink +
  ``fraction_remain`` termination (``nested.py:458-464``), final live-point
  integration (``nested.py:487-496``)
- checkpoint/resume via ``checkpoint_<it>.txt`` JSON + ``active_*.npy`` +
  ``saved_*.npy`` (``nested.py:166-195,250-260,473-485``), extended with the
  flow params and PRNG key for exact resume.

Beyond the reference, the strategy ladder accepts ``'slice'`` — a
constrained latent-space slice-sampling kernel (Neal 2003 stepping-out/
shrinkage; PolyChord's within-shell move) targeting the same invariant
distribution as ``'mcmc'``, for curved/degenerate shells where fixed-scale
Metropolis under-mixes. Tunables: ``slice_steps`` (default ``2*x_dim``),
``slice_width``, ``slice_max_expand``, ``slice_max_shrink``.
"""

from __future__ import annotations

import csv
import glob
import json
import logging
import pickle
import os

import jax
import numpy as np

from nnest_tpu.priors import UniformPrior
from nnest_tpu.samplers.base import Sampler

# Compiled once per (n, hi); an eager randint is a full remote dispatch per
# MCMC pool regeneration on the axon TPU tunnel.
_randint = jax.jit(lambda key, n, hi: jax.random.randint(key, (n,), 0, hi),
                   static_argnums=(1, 2))


class NestedSampler(Sampler):

    def __init__(self,
                 x_dim,
                 loglike,
                 transform=None,
                 append_run_num=True,
                 hidden_dim=0,
                 num_slow=0,
                 num_derived=0,
                 batch_size=100,
                 flow='spline',
                 num_blocks=3,
                 num_layers=1,
                 learning_rate=0.001,
                 log_dir='logs/test',
                 resume=True,
                 base_dist=None,
                 scale='',
                 use_gpu=False,
                 trainer=None,
                 oversample_rate=-1,
                 log_level=logging.INFO,
                 param_names=None,
                 num_live_points=1000,
                 seed=0,
                 mesh=None):
        # The sampling unit cube is [-1, 1]^d (reference nested.py:76); the
        # user transform maps it to physical space.
        prior = UniformPrior(x_dim, -1.0, 1.0)
        prior.seed(seed)
        self.sampler = 'nested'
        # Insertion-index diagnostic results (populated by run()).
        self.insertion_ranks = np.empty(0, dtype=np.int64)
        self.insertion_statistic = None
        self.insertion_p_value = None
        self.insertion_rolling_p_value = None
        self.logzerr_bootstrap = None
        self.thread_slots = None
        # Birth threshold of the initial live set: -inf for a prior-seeded
        # run; dynamic batches (samplers/dynamic.py) run above a floor.
        self._birth_floor = -np.inf

        super().__init__(
            x_dim, loglike, transform=transform, prior=prior,
            append_run_num=append_run_num, hidden_dim=hidden_dim,
            num_slow=num_slow, num_derived=num_derived,
            batch_size=batch_size, flow=flow, num_blocks=num_blocks,
            num_layers=num_layers, learning_rate=learning_rate,
            log_dir=log_dir, resume=resume, use_gpu=use_gpu,
            base_dist=base_dist, scale=scale, trainer=trainer,
            transform_prior=False, oversample_rate=oversample_rate,
            log_level=log_level, param_names=param_names, seed=seed,
            mesh=mesh)

        self.num_live_points = num_live_points

        if self.single_or_primary_process:
            self._save_params({'num_live_points': num_live_points})
            self.logger.info('Num live points [%d]' % self.num_live_points)
            if self.logs is not None:
                with open(os.path.join(self.logs['results'],
                                       'results.csv'), 'w') as f:
                    csv.writer(f).writerow(
                        ['step', 'acceptance', 'min_ess', 'max_ess',
                         'jump_distance', 'scale', 'loglstar', 'logz',
                         'fraction_remain', 'ncall'])

    # -------------------------------------------------------------- prewarm

    def prewarm(self, strategy=None, max_iters_per_method=2,
                **run_kwargs):
        """Compile (and persist into the compilation cache) the device
        programs a ``run()`` with this configuration will need, BEFORE
        the real run pays for them: the 20-D slice program measured ~11
        minutes of cold remote-compile service time (BENCHMARKS.md
        round 3 part 6); after a prewarm the real run's first dispatch
        loads from the persistent cache in seconds.

        Mechanics: one bounded throwaway run per strategy method (each
        in a temp dir, ``strategy=[method]``, ``max_iters_per_method``
        iterations) with THIS sampler's likelihood/transform/flow
        configuration — compiled programs are keyed on the traced
        computation, so the likelihood closure and every static shape
        (num_live_points, chain counts, step counts, gen batches,
        adapt flags) must match the real run: pass the same
        ``run_kwargs`` you will pass to ``run()``. Covers initial flow
        training + the first pool-generation program of each method;
        deeper programs that only materialize later (higher rungs of
        the adaptive rejection trial ladder) still compile on first
        use. This sampler instance is untouched (fresh throwaway
        samplers do the compiling); the user likelihood's evaluation
        counter does advance by the throwaway runs' (few) calls.

        Returns {method: wall_seconds} — dominated by compile time on a
        cold cache, near-zero on a warm one. Custom ``base_dist`` flows
        are not covered (pass-through not captured); their programs
        compile on first real use as before.
        """
        import shutil
        import tempfile
        import time as _time

        strategy = list(strategy or ['rejection_prior', 'mcmc'])
        unknown = [m for m in strategy if m not in self._METHODS]
        if unknown:
            raise ValueError('unknown strategy method(s) %s' % unknown)
        kwargs = dict(run_kwargs)
        kwargs.pop('strategy', None)
        kwargs.pop('max_iters', None)
        # Rebuild the throwaway samplers from the captured constructor
        # args (everything trace-relevant: flow arch, batch size, slow
        # dims, ...) rather than a hand-copied list — a forgotten or
        # future config field would silently compile programs the real
        # run never uses, re-paying the cold compile prewarm exists to
        # avoid. Intersect with this class's signature; run-identity
        # fields (dirs/seed/resume/logging) are overridden below.
        import inspect
        sig_params = set(inspect.signature(type(self).__init__).parameters)
        override = {'self', 'x_dim', 'loglike', 'transform', 'prior',
                    'trainer', 'base_dist', 'log_dir', 'append_run_num',
                    'resume', 'seed', 'log_level', 'mesh',
                    'num_live_points'}
        ctor = {k: v for k, v in self._init_args.items()
                if k in sig_params - override}
        walls = {}
        tmp = tempfile.mkdtemp(prefix='nnest_prewarm_')
        try:
            for m in strategy:
                t0 = _time.time()
                s = type(self)(
                    self.x_dim, self._user_loglike,
                    transform=self._user_transform,
                    num_live_points=self.num_live_points,
                    log_dir=os.path.join(tmp, m),
                    append_run_num=False, resume=False,
                    log_level=logging.WARNING, seed=0, mesh=self.mesh,
                    **ctor)
                s.run(strategy=[m], max_iters=max_iters_per_method,
                      **kwargs)
                walls[m] = round(_time.time() - t0, 1)
                self.logger.info('Prewarmed %r in %.1f s' % (m, walls[m]))
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return walls

    # ------------------------------------------------------------------ run

    def run(self, *args, **kwargs):
        """See :meth:`_run_impl` for the full signature/docs. This thin
        wrapper only guarantees the opt-in tqdm bar is closed when the
        run raises (likelihood exception, Ctrl-C in the kill-then-resume
        workflow) — a live bar would otherwise corrupt subsequent logger
        output."""
        self._run_pbar = None
        try:
            return self._run_impl(*args, **kwargs)
        finally:
            pb = getattr(self, '_run_pbar', None)
            if pb is not None:
                pb.close()
                self._run_pbar = None

    def _run_impl(self,
            strategy=None,
            mcmc_steps=0,
            mcmc_num_chains=None,
            mcmc_dynamic_step_size=True,
            max_iters=1000000,
            update_interval=None,
            log_interval=None,
            dlogz=0.5,
            train_iters=500,
            volume_switch=-1.0,
            step_size=0.0,
            jitter=-1.0,
            rejection_cache_interval=10,
            rejection_enlargement_factor=1.1,
            rejection_trials=None,
            rejection_batch_size=512,
            rejection_max_trials=65536,
            rejection_adapt_trials=True,
            retrain_nll_threshold=0.5,
            mcmc_gen_batch=8,
            mcmc_speculate=False,
            mcmc_adapt='cov',
            rejection_gen_batch=8,
            slice_steps=0,
            slice_width=1.0,
            slice_max_expand=4,
            slice_max_shrink=10,
            slice_adapt='cov',
            init_points=None,
            birth_floor=None,
            logl_ceiling=None,
            show_progress=False):
        # Dynamic-batch hooks (samplers/dynamic.py): an externally supplied
        # initial live set (already uniform within {logl > birth_floor}),
        # the batch's birth threshold (recorded in threads.npz so merged
        # evidence reconstructs per-point births correctly), and an upper
        # likelihood bound — the batch terminates once every live point
        # exceeds it (Higson et al. 2019 batch runs). All three default to
        # the plain prior-seeded static run.
        if birth_floor is not None:
            self._birth_floor = float(birth_floor)
        if strategy is None or len(strategy) == 0:
            strategy = ['rejection_prior', 'mcmc']
        unknown = [m for m in strategy if m not in self._METHODS]
        if unknown:
            raise ValueError('unknown strategy method(s) %s; choose from %s'
                             % (unknown, list(self._METHODS)))
        expired = []
        current_method = ''

        if update_interval is None:
            update_interval = max(1, round(0.5 * self.num_live_points))
        else:
            update_interval = round(update_interval)
            if update_interval < 1:
                raise ValueError('update_interval must be >= 1')

        if log_interval is None:
            log_interval = max(1, round(0.2 * self.num_live_points))
        else:
            log_interval = round(log_interval)
            if log_interval < 1:
                raise ValueError('log_interval must be >= 1')

        if mcmc_num_chains is None:
            # The reference default is 10 chains (nested.py:101); on
            # accelerators wider chain batches amortize the per-dispatch
            # link latency — the same trick as the reference's MPI
            # candidate pooling (nested.py:416-427), just batched on-chip.
            # Above ~8-D the accept rate per chain drops enough that 256
            # chains measure ~15% faster end-to-end for +1% ncall
            # (BENCHMARKS.md chain-width study); below that the wider
            # batch only burns likelihood calls.
            mcmc_num_chains = (10 if jax.default_backend() == 'cpu'
                               else (256 if self.x_dim >= 8 else 128))
        if mcmc_steps <= 0:
            mcmc_steps = 5 * self.x_dim
            if self.x_dim >= 40 and self.single_or_primary_process:
                # Measured (BENCHMARKS.md round 5 part 2): at 50-D the
                # reference's 5*d default leaves chain endpoints
                # correlated with their still-alive starts — a +0.08-nat
                # (0.6 sigma) high evidence systematic on the 50-D
                # Gaussian control that VANISHES at 10*d steps (for 2x
                # the likelihood calls). The quoted logzerr_adjusted
                # covers it; this is an informational nudge, not a flag.
                self.logger.info(
                    'mcmc_steps defaulted to 5*x_dim = %d. At x_dim >= '
                    '~40 this budget leaves a measured ~+0.1-nat '
                    'evidence systematic (endpoint-start correlation; '
                    'BENCHMARKS.md round 5) — mcmc_steps=%d removes it '
                    'at 2x the likelihood cost.'
                    % (mcmc_steps, 10 * self.x_dim))
        if step_size <= 0.0:
            step_size = 1.0 / self.x_dim ** 0.5
        if slice_steps <= 0:
            # One slice move decorrelates along one latent direction, so
            # ~2 passes over the basis suffice where fixed-scale Metropolis
            # needs >=5d-20d steps (PolyChord's num_repeats heuristic;
            # measured on 20-D Rosenbrock, BENCHMARKS.md).
            slice_steps = 2 * self.x_dim
        if slice_adapt not in ('cov', 'iso'):
            raise ValueError("slice_adapt must be 'cov' or 'iso'")
        if mcmc_adapt not in ('cov', 'iso'):
            raise ValueError("mcmc_adapt must be 'cov' or 'iso'")
        # 'cov' (default): covariance-PRECONDITIONED Metropolis proposals
        # dz ~ N(0, scale^2 * C) — the Metropolis analogue of
        # slice_adapt='cov', subsuming the reference's isotropic proposal
        # (sampler.py:307-316; C -> I recovers it). Targets the round-4
        # finding that the non-axis-aligned ridge direction of curved
        # degeneracies never decorrelates under isotropic proposals at
        # any step count (BENCHMARKS.md). C comes from a RED-BLACK split
        # of the live set: chain starts draw from a random half, C from
        # the complement — estimating C from the full set (which contains
        # the starts) is the adaptive-MCMC pitfall and measurably biased
        # the 50-D Gaussian evidence +0.35 nats (kernels._latent_cov_chol,
        # BENCHMARKS.md round 5). 'iso' restores the round-4 isotropic
        # reference-compatible proposal.
        mcmc_adapt_cov = mcmc_adapt == 'cov'
        # 'cov' (default): slice directions drawn from the live set's
        # latent covariance (d = L n_hat, PolyChord-style per-generation
        # whitening in z) — the fix for curved degeneracies where the
        # globally-whitening flow leaves the within-shell latent cloud
        # anisotropic (measured on 20-D Rosenbrock, BENCHMARKS.md). The
        # direction covariance uses the same red-black split as
        # mcmc_adapt='cov' (independence of the chains' own starts).
        # 'iso' restores the round-3 isotropic directions.
        slice_adapt_cov = slice_adapt == 'cov'
        # Likelihood-calls-per-accept proxy for the strategy-expiry
        # threshold when 'slice' (not 'mcmc') is the downstream method:
        # each slice step pays ~1 shrink hit + up to max_expand
        # stepping-out probes.
        slice_calls = slice_steps * (1 + slice_max_expand)
        # Speculative prefetch only ever wins through the NLL retrain gate
        # (an unconditional retrain voids every generation past a
        # boundary); disabling it here is pure perf — results are
        # bit-identical either way because lost speculations rewind the
        # key stream to the unfused route's exact sequence.
        mcmc_speculate = bool(mcmc_speculate
                              and retrain_nll_threshold is not None)
        if rejection_trials is not None:
            rejection_batch_size = int(rejection_trials)
        rejection_max_trials = max(int(rejection_max_trials),
                                   rejection_batch_size)

        if self.single_or_primary_process:
            self.logger.info('MCMC steps [%d]' % mcmc_steps)
            self.logger.info('Initial scale [%5.4f]' % step_size)
            self.logger.info('Volume switch [%5.4f]' % volume_switch)

        # A previous run() on this instance may still have checkpoint
        # writes in flight — they must be on disk before we read them.
        self._drain_io()
        state = self._load_checkpoint()
        controller = None
        pool_state = None
        if state is not None:
            if init_points is not None:
                raise ValueError(
                    'init_points is for fresh dynamic batch runs; this '
                    'log_dir has a resumable checkpoint (use resume=False '
                    'or a fresh log_dir)')
            (it, active_u, active_v, active_logl, active_derived, saved_v,
             saved_logl, saved_logwt, logz, h, logvol, fraction_remain,
             strategy, expired, controller, pool_state) = state
            if self.single_or_primary_process:
                self.logger.info('Resumed from checkpoint [%d]%s' % (
                    it, ' (bit-exact)' if controller and pool_state
                    else ''))
        else:
            if init_points is not None:
                # Dynamic batch: the caller supplies live points already
                # uniform within {logl > birth_floor} (refreshed through
                # the constrained kernels by DynamicNestedSampler); their
                # likelihoods were paid for by the seeding kernel, so no
                # re-evaluation here.
                active_u = np.asarray(init_points['u'], dtype=np.float64)
                if active_u.shape != (self.num_live_points, self.x_dim):
                    raise ValueError(
                        'init_points u must be (num_live_points, x_dim)')
                active_v = np.asarray(
                    init_points.get('v', self.transform(active_u)),
                    dtype=np.float64)
                active_logl = np.asarray(init_points['logl'],
                                         dtype=np.float64)
                active_derived = np.asarray(
                    init_points.get('derived',
                                    np.zeros((self.num_live_points,
                                              self.num_derived))),
                    dtype=np.float64).reshape(self.num_live_points, -1)
                if self._birth_floor > -np.inf and \
                        not np.all(active_logl > self._birth_floor):
                    raise ValueError(
                        'init_points logl must all exceed birth_floor')
            else:
                active_u = np.asarray(
                    self.sample_prior(self.num_live_points),
                    dtype=np.float64)
                active_v = np.asarray(self.transform(active_u),
                                      dtype=np.float64)
                logl, derived = self.loglike(active_u)
                active_logl = np.asarray(logl, dtype=np.float64)
                active_derived = np.asarray(derived, dtype=np.float64)

            if self.single_or_primary_process:
                self.logger.info(
                    'Step [0] max logl [%5.4e] vol [1.0] ncalls [%d]'
                    % (np.max(active_logl), self.total_calls))

            saved_v = []
            saved_logl = []
            saved_logwt = []
            h = 0.0
            logz = -1e300
            logvol = float(np.log(1.0 - np.exp(-1.0 / self.num_live_points)))
            fraction_remain = 1.0
            it = 0
            self._write_checkpoint(it, active_u, active_v, active_logl,
                                   active_derived, saved_v, saved_logl,
                                   saved_logwt, logz, h, logvol,
                                   fraction_remain, strategy, expired,
                                   insertion_ranks=[], saved_slots=[],
                                   saved_u=[])

        # Insertion-rank history for the uniformity diagnostic — restored
        # from the checkpoint on (bit- or statistically-) exact resume so
        # the end-of-run KS test covers the whole run.
        insertion_ranks = ([int(x) for x in
                            getattr(self, '_restored_insertion_ranks', [])]
                           if state is not None else [])
        self._mix_ratios = []   # fresh mixing history per run() call
        self._mix_ratios_eig = []
        self._latent_conds = []
        self._mix_rels = []
        self._cond_rels = []
        self._cond_infl = []
        # Dead-point thread ids (live-set slot of each death) for the
        # bootstrap logZ error. None = unavailable (legacy checkpoint
        # without the slot file) — the diagnostic is then skipped.
        if state is not None:
            rs = getattr(self, '_restored_saved_slots', None)
            saved_slots = None if rs is None else [int(x) for x in rs]
            # u-space dead points (dynamic-batch seeding): restored when
            # the checkpoint carries them, else unavailable for this run.
            ru = getattr(self, '_restored_saved_u', None)
            saved_u = None if ru is None else [np.array(r) for r in ru]
        else:
            saved_slots = []
            saved_u = []
        first_time = True
        last_trained_it = -1
        need_pool = True
        pool = None           # candidate pool: dict of arrays
        pool_pos = 0
        mcmc_gen_buffer = []   # prefetched MCMC pool generations
        prior_gen_buffer = []  # prefetched prior-rejection generations
        flow_gen_buffer = []   # prefetched flow-rejection generations
        env_gens = 0          # rejection-flow pool generations since the
        #                       envelope (max_log_det_j / max_r) was computed
        ncs = []
        mean_calls = 0.0
        mcmc_scale = step_size
        accept_point = True
        # Adaptive rejection batch: the per-dispatch cost of the batched
        # rejection kernels is latency- not FLOP-bound (one call costs the
        # same at 512 or 65536 trials to within ~20%, BENCHMARKS.md), so as
        # the shell shrinks and acceptance decays, doubling the trial batch
        # keeps candidates-per-dispatch roughly constant. Pool consumption
        # re-checks logl > loglstar, so a surplus pool stays exact (uniform
        # conditioning); `cur_trials` only follows the power-of-two ladder
        # to bound jit recompiles, and the controller is driven by the
        # lockstep-identical accept count so multi-process runs stay in
        # step. The reference draws one trial per host-loop pass
        # (sampler.py:545-607) and has no analogue.
        cur_trials = int(rejection_batch_size)
        trials_target = max(16, self.num_live_points // 8)
        last_io_it = it      # iteration of the last checkpoint/chain write

        if controller:
            # Bit-exact resume: restore the proposal/ladder/envelope
            # controller exactly as the uninterrupted run would have had
            # it. Together with the pool state (unconsumed candidate pool
            # + compact prefetch buffers, restored below) and the trainer
            # state, the resumed run's candidate stream — and hence the
            # final logz/h/ncall — is bit-identical to the uninterrupted
            # continuation from ANY checkpoint.
            mcmc_scale = float(controller.get('mcmc_scale', mcmc_scale))
            cur_trials = int(controller.get('cur_trials', cur_trials))
            nw = [float(x) for x in controller.get('ncs_tail', [])]
            nc_count = int(controller.get('ncs_count', len(nw)))
            # device ring mirrors use len(ncs) for phase + the >20 gate:
            # zero-pad to the true count (only the last 20 enter means)
            ncs = [0.0] * max(0, nc_count - len(nw)) + nw
            mean_calls = float(controller.get('mean_calls', mean_calls))
            env_gens = int(controller.get('env_gens', env_gens))
            if controller.get('max_log_det_j') is not None:
                self._max_log_det_j = float(controller['max_log_det_j'])
                self._max_r = float(controller.get('max_r', 0.0))
            first_time = bool(controller.get('first_time', first_time))
            last_trained_it = int(controller.get('last_trained_it',
                                                 last_trained_it))
            self.total_accepted = int(controller.get('total_accepted',
                                                     self.total_accepted))
            self.total_rejected = int(controller.get('total_rejected',
                                                     self.total_rejected))
            last_io_it = int(controller.get('last_io_it', last_io_it))

        if pool_state and pool_state.get('it') is not None:
            # Restore the in-flight candidate pool (unconsumed remainder)
            # and the compact prefetch buffers exactly as the checkpoint
            # captured them, so the saved PRNG key lines up with the next
            # real dispatch regardless of where in a pool the checkpoint
            # landed.
            need_pool = bool(pool_state['need_pool'])
            if pool_state['pool'] is not None:
                pool = {k: np.asarray(v)
                        for k, v in pool_state['pool'].items()
                        if k in ('u', 'logl', 'derived')}
                if 'mean_jump' in pool_state['pool']:
                    pool['mean_jump'] = float(
                        pool_state['pool']['mean_jump'])
                if 'stats' in pool_state['pool']:
                    pool['stats'] = pool_state['pool']['stats']
                pool_pos = 0   # remainder was saved from pool_pos onward
            # Back-compat: pre-speculation checkpoints stored 3-tuples
            # (out, start_loglstar, start_it); newer buffers append the
            # pre-generation PRNG key data used to rewind after a lost
            # retrain speculation.
            mcmc_gen_buffer = [tuple(g) if len(g) == 4 else
                               (g[0], g[1], g[2], None)
                               for g in (pool_state.get('mcmc_buf') or [])]
            prior_gen_buffer = list(pool_state.get('prior_buf') or [])
            flow_gen_buffer = list(pool_state.get('flow_buf') or [])

        def pool_state_snapshot():
            remainder = None
            if pool is not None and not need_pool:
                remainder = {k: np.array(pool[k][pool_pos:])
                             for k in ('u', 'logl', 'derived')
                             if k in pool}
                if 'mean_jump' in pool:
                    remainder['mean_jump'] = float(pool['mean_jump'])
                if 'stats' in pool:
                    # Window-level kernel stats (acceptance/ESS/jump):
                    # results.csv rows written after a mid-pool resume
                    # must match the uninterrupted run's (they report the
                    # last kernel window, not lifetime counters).
                    st = pool['stats']
                    remainder['stats'] = {
                        'ess': np.array(st['ess']),
                        'acceptance': float(st['acceptance']),
                        'mean_jump': float(st['mean_jump']),
                        'mix_ratio': st.get('mix_ratio'),
                        'mix_ratio_eig': st.get('mix_ratio_eig'),
                        'latent_cond': st.get('latent_cond'),
                    }
            return {
                'it': int(it),
                'need_pool': bool(need_pool),
                'pool': remainder,
                'mcmc_buf': list(mcmc_gen_buffer),
                'prior_buf': list(prior_gen_buffer),
                'flow_buf': list(flow_gen_buffer),
            }

        # Seed the strategy ladder with its first pick so the first loop
        # pass does not register a '' -> method "switch": that switch
        # resets need_pool/cur_trials, which on a resume would discard the
        # restored in-flight pool (and pop prefetched generations too
        # early). For fresh runs this is a no-op (need_pool is already
        # True and cur_trials is already the reset value).
        for method in strategy:
            if method not in expired:
                current_method = method
                break

        def controller_snapshot():
            return {
                'mcmc_scale': float(mcmc_scale),
                'cur_trials': int(cur_trials),
                'ncs_tail': [float(x) for x in ncs[-20:]],
                'ncs_count': len(ncs),
                'mean_calls': float(mean_calls),
                'env_gens': int(env_gens),
                'max_log_det_j': (None if self._max_log_det_j is None
                                  else float(self._max_log_det_j)),
                'max_r': (None if self._max_r is None
                          else float(self._max_r)),
                'first_time': bool(first_time),
                'last_trained_it': int(last_trained_it),
                'total_accepted': int(self.total_accepted),
                'total_rejected': int(self.total_rejected),
                'last_io_it': int(last_io_it),
            }

        # Opt-in progress bar (the reference wraps its loops in tqdm,
        # sampler.py:256,654; here the host consumption loop is the only
        # per-iteration site). Logging keeps working alongside it.
        pbar = None
        if show_progress and self.single_or_primary_process:
            try:
                from tqdm import tqdm as _tqdm
                pbar = _tqdm(initial=it, unit='it', desc='nested',
                             dynamic_ncols=True)
                self._run_pbar = pbar   # closed by run() on exceptions
            except ImportError:
                pass

        while fraction_remain > dlogz and it <= max_iters and (
                logl_ceiling is None
                or float(np.min(active_logl)) <= logl_ceiling):

            worst = int(np.argmin(active_logl))
            logwt = logvol + active_logl[worst]
            loglstar = float(active_logl[worst])
            expected_vol = np.exp(-it / self.num_live_points)

            if accept_point:
                # Evidence and information update (nested.py:280-293).
                logz_new = np.logaddexp(logz, logwt)
                h = (np.exp(logwt - logz_new) * active_logl[worst]
                     + np.exp(logz - logz_new) * (h + logz) - logz_new)
                logz = logz_new
                if self.num_derived > 0:
                    saved_v.append(np.concatenate(
                        (active_v[worst], active_derived[worst])))
                else:
                    saved_v.append(np.array(active_v[worst], copy=True))
                saved_logwt.append(logwt)
                saved_logl.append(active_logl[worst])
                if saved_slots is not None:
                    # Thread id for the bootstrap error estimator: with
                    # in-place replacement the live-set SLOT is exactly
                    # the single-live-point thread lineage (Higson et al.
                    # 2019 decomposition).
                    saved_slots.append(int(worst))
                if saved_u is not None:
                    saved_u.append(np.array(active_u[worst], copy=True))
                accept_point = False

            # Strategy ladder (nested.py:300-309).
            old_method = current_method
            for method in strategy:
                if method not in expired:
                    current_method = method
                    break
            if current_method != old_method:
                need_pool = True
                cur_trials = int(rejection_batch_size)

            def valid(method):
                return method in strategy and method not in expired

            # The downstream within-shell kernel ('mcmc' or 'slice'; first
            # non-expired wins) and its likelihood-calls-per-accept cost —
            # the rejection phases expire once they cost more than it.
            mcmc_like = next((m for m in strategy
                              if m in ('mcmc', 'slice')
                              and m not in expired), None)
            switch_calls = (slice_calls if mcmc_like == 'slice'
                            else mcmc_steps)

            if current_method != 'rejection_prior' and (
                    first_time or (it % update_interval == 0
                                   and it != last_trained_it)):
                last_trained_it = it
                # Conditional retrain: the latent Metropolis/rejection
                # kernels are exact for ANY fixed flow (the Jacobian enters
                # the acceptance ratio), so flow quality only affects
                # proposal efficiency — when the current flow still fits
                # the new live set (mean NLL within retrain_nll_threshold
                # nats of the last training's best validation NLL), skip
                # the retrain. The reference retrains unconditionally every
                # update_interval (nested.py:311-314); flow training was
                # 54-60% of a warm 10-D run's wall clock. The NLL check is
                # deterministic (no PRNG), so multi-process runs stay in
                # lockstep. Disable with retrain_nll_threshold=None.
                retrain = True
                # The < 1e29 guard excludes the trainer's 1e30 "no epoch
                # ever improved" sentinel: after a diverged training (all
                # val losses NaN) every finite live-set NLL would beat
                # 1e30 + threshold and the flow would never retrain again.
                if (not first_time and retrain_nll_threshold is not None
                        and self.trainer.best_validation_loss is not None
                        and self.trainer.best_validation_loss < 1e29):
                    with self.timers.time('retrain_check'):
                        nll_now = -float(np.mean(self.trainer.log_probs(
                            active_u.astype(np.float32), to_numpy=True)))
                    retrain = not (nll_now < self.trainer
                                   .best_validation_loss
                                   + retrain_nll_threshold)
                if retrain:
                    if mcmc_gen_buffer:
                        # Lost speculation (mcmc_speculate=True): the
                        # not-yet-consumed generations in the buffer were
                        # produced with the params this retrain is about
                        # to replace — in the one-dispatch-per-generation
                        # route they would have been generated AFTER the
                        # retrain. Discard them and rewind the sampler key
                        # to just before the first discarded generation's
                        # two splits, so the regeneration under the new
                        # params consumes exactly the keys the unfused
                        # route would have (bit-identical evidence).
                        kb = mcmc_gen_buffer[0][3]
                        if kb is None:
                            raise RuntimeError(
                                'prefetched MCMC generations span a '
                                'retrain boundary but carry no rewind key '
                                '(buffer from a non-speculative dispatch '
                                'or a pre-speculation checkpoint; did '
                                'update_interval change across a resume?)')
                        self._rewind_key(kb)
                        # The in-flight pool (the generation currently
                        # being consumed) stays: the unfused route also
                        # produced it with the pre-retrain params.
                        self._spec_losses = (
                            getattr(self, '_spec_losses', 0)
                            + len(mcmc_gen_buffer))
                        mcmc_gen_buffer = []
                    with self.timers.time('flow_train'):
                        self.trainer.train(active_u.astype(np.float32),
                                           max_iters=train_iters,
                                           jitter=jitter)
                    first_time = False
                    # The rejection-flow envelope is a function of the flow
                    # params (reference sampler.py:555-560): any retrain
                    # invalidates it, regardless of which iteration the
                    # next pool regeneration happens to land on.
                    self._max_log_det_j = None

            if current_method in ('rejection_prior', 'rejection_flow',
                                  'density_flow'):
                if need_pool:
                    served_from_prefetch = False
                    if current_method == 'rejection_prior':
                        # Multi-generation prefetch (see mcmc branch below
                        # for the f32-exactness gate rationale). The device
                        # stops before any generation the host might not
                        # consume — ladder trigger (exact integers),
                        # volume-switch crossing (host-precomputed iteration
                        # bound), mean-calls expiry (conservative f32 proxy
                        # at 0.9x the threshold) — so the key stream stays
                        # bit-identical to one dispatch per generation.
                        use_prior_batch = (self.mesh is None
                                           and rejection_gen_batch > 1)
                        if use_prior_batch and not prior_gen_buffer:
                            al32 = active_logl.astype(np.float32)
                            use_prior_batch = bool(np.all(
                                al32.astype(np.float64) == active_logl))
                            if use_prior_batch:
                                if volume_switch > 0:
                                    it_stop = int(np.ceil(
                                        -self.num_live_points
                                        * np.log(volume_switch))) - 2
                                else:
                                    it_stop = 2 ** 30
                                thr = (0.9 * switch_calls
                                       if volume_switch < 0
                                       and mcmc_like is not None else
                                       np.float32(1e30))
                                max_gens = min(
                                    rejection_gen_batch,
                                    max(1, 2 ** 18 // cur_trials))
                                # Compact each generation at fill time
                                # (ok-masked candidate rows + scalars, a
                                # few KB): pops then do pure bookkeeping,
                                # and the buffer serializes directly into
                                # checkpoints for bit-exact mid-pool
                                # resume.
                                prior_gen_buffer = [
                                    self._compact_rejection_gen(
                                        g[0], g[1], g[2], g[3], None,
                                        None, None, g[4], g[5],
                                        cur_trials)
                                    for g in
                                    self._rejection_prior_generations_batch(
                                        active_u, active_logl,
                                        active_derived if
                                        self.num_derived > 0 else
                                        np.empty(
                                            (self.num_live_points, 0)),
                                        it, max_iters, it_stop, ncs, thr,
                                        trials_target, cur_trials,
                                        max_gens, rejection_adapt_trials,
                                        cur_trials * 2
                                        <= rejection_max_trials,
                                        cur_trials
                                        >= 2 * rejection_batch_size)]
                        if use_prior_batch and prior_gen_buffer:
                            g = prior_gen_buffer.pop(0)
                            if g['it'] != it or g['loglstar'] != float(
                                    np.float32(loglstar)) or \
                                    g['trials'] != cur_trials:
                                raise RuntimeError(
                                    'prior generation prefetch desync: '
                                    'device (it=%d, loglstar=%r, '
                                    'trials=%d) vs host (it=%d, '
                                    'loglstar=%r, trials=%d)' % (
                                        g['it'], g['loglstar'],
                                        g['trials'], it,
                                        float(np.float32(loglstar)),
                                        cur_trials))
                            self.total_calls += g['trials']
                            nc = (g['trials'] / max(g['n_ok'], 1)
                                  if g['n_ok'] > 0 else g['trials'])
                            s, ll, ds = g['s'], g['ll'], g['ds']
                            served_from_prefetch = True
                        else:
                            with self.timers.time('candidate_kernel'):
                                s, ll, ds, nc = \
                                    self._rejection_prior_sample(
                                        loglstar, num_trials=cur_trials)
                    elif current_method == 'rejection_flow':
                        # Recompute the envelope whenever the flow has been
                        # retrained since it was last computed (invalidated
                        # above) or after rejection_cache_interval pool
                        # generations — pool regeneration happens at
                        # arbitrary iterations, so it-modulo triggers could
                        # leave a stale envelope in place across retrains.
                        recompute = (self._max_log_det_j is None
                                     or env_gens >= rejection_cache_interval)
                        # Multi-generation prefetch (see prior branch): the
                        # envelope cache rides the device between
                        # generations; the update_interval crossing stop
                        # guarantees no prefetched generation can span a
                        # retrain (which invalidates flow AND envelope).
                        use_flow_batch = (self.mesh is None
                                          and rejection_gen_batch > 1)
                        if use_flow_batch and not flow_gen_buffer:
                            al32 = active_logl.astype(np.float32)
                            use_flow_batch = bool(np.all(
                                al32.astype(np.float64) == active_logl))
                            if use_flow_batch:
                                thr = (0.9 * switch_calls
                                       if mcmc_like is not None
                                       else np.float32(1e30))
                                max_gens = min(
                                    rejection_gen_batch,
                                    max(1, 2 ** 18 // cur_trials))
                                flow_gen_buffer = [
                                    self._compact_rejection_gen(
                                        g[0], g[1], g[2], g[3], g[4],
                                        g[5], g[6], g[7], g[8],
                                        cur_trials)
                                    for g in
                                    self._rejection_flow_generations_batch(
                                        active_u.astype(np.float32),
                                        active_logl,
                                        active_derived if
                                        self.num_derived > 0 else
                                        np.empty(
                                            (self.num_live_points, 0)),
                                        it, max_iters, update_interval,
                                        ncs, thr, trials_target,
                                        self._max_log_det_j is not None,
                                        env_gens,
                                        (self._max_log_det_j
                                         if self._max_log_det_j is not None
                                         else 0.0),
                                        (self._max_r
                                         if self._max_r is not None
                                         else 0.0),
                                        rejection_cache_interval,
                                        rejection_enlargement_factor,
                                        rejection_enlargement_factor,
                                        cur_trials, max_gens,
                                        rejection_adapt_trials,
                                        cur_trials * 2
                                        <= rejection_max_trials,
                                        cur_trials
                                        >= 2 * rejection_batch_size)]
                        if use_flow_batch and flow_gen_buffer:
                            g = flow_gen_buffer.pop(0)
                            if g['it'] != it or g['loglstar'] != float(
                                    np.float32(loglstar)) or \
                                    g['trials'] != cur_trials:
                                raise RuntimeError(
                                    'flow generation prefetch desync: '
                                    'device (it=%d, loglstar=%r, '
                                    'trials=%d) vs host (it=%d, '
                                    'loglstar=%r, trials=%d)' % (
                                        g['it'], g['loglstar'],
                                        g['trials'], it,
                                        float(np.float32(loglstar)),
                                        cur_trials))
                            self._max_log_det_j = g['mld']
                            self._max_r = g['mr']
                            self.total_calls += g['nev']
                            nc = (g['nev'] / max(g['n_ok'], 1)
                                  if g['n_ok'] > 0 else max(g['nev'], 1))
                            s, ll, ds = g['s'], g['ll'], g['ds']
                            served_from_prefetch = True
                        else:
                            with self.timers.time('candidate_kernel'):
                                s, ll, ds, nc = self._rejection_flow_sample(
                                    active_u.astype(np.float32), loglstar,
                                    enlargement_factor=(
                                        rejection_enlargement_factor),
                                    cache=not recompute,
                                    num_trials=cur_trials)
                        env_gens = 0 if recompute else env_gens + 1
                    else:
                        with self.timers.time('candidate_kernel'):
                            s, ll, ds, nc = self._density_sample(
                                loglstar, num_trials=cur_trials)

                    # Efficiency window (reference nested.py:327-328). The
                    # per-generation contribution is capped well below the
                    # 20-entry window so the switch decision averages over
                    # at least ~4 independent pool generations instead of
                    # being dominated by one unlucky batch.
                    if rejection_adapt_trials:
                        n_ok = int(s.shape[0])
                        if (n_ok < trials_target // 2
                                and cur_trials * 2 <= rejection_max_trials):
                            cur_trials *= 2
                        elif (n_ok > trials_target * 2
                                and cur_trials >= 2 * rejection_batch_size):
                            cur_trials //= 2
                        self._last_rejection_trials = cur_trials

                    ncs.extend([nc] * min(max(s.shape[0], 1), 5))
                    mean_calls = float(np.mean(ncs[-20:])) if len(ncs) > 20 \
                        else 0.0

                    # Efficiency-based strategy expiry (nested.py:330-334,
                    # 345-348,357-360 — incl. the volume_switch trigger).
                    switch = False
                    if current_method == 'rejection_prior':
                        switch = (0 <= volume_switch > expected_vol) or (
                            volume_switch < 0
                            and mean_calls > switch_calls
                            and mcmc_like is not None)
                    else:
                        switch = (mean_calls > switch_calls
                                  and mcmc_like is not None)
                    if switch:
                        self.logger.info(
                            '%s no longer efficient, switching sampling '
                            'method' % current_method)
                        expired.append(current_method)
                        ncs = []

                    # The device's stop rules guarantee the prefetch never
                    # outruns a ladder change or strategy expiry; a
                    # leftover buffer here means its key splits were
                    # consumed for generations the true sequence would
                    # have run differently — fail loudly rather than
                    # silently break bit-reproducibility.
                    leftover = prior_gen_buffer or flow_gen_buffer
                    if served_from_prefetch and leftover and (
                            switch or leftover[0]['trials'] != cur_trials):
                        raise RuntimeError(
                            'rejection generation prefetch outran a '
                            'ladder/expiry decision (switch=%s, trials '
                            '%d -> %d)' % (switch, leftover[0]['trials'],
                                           cur_trials))

                    pool = {'u': s, 'logl': ll, 'derived': ds}
                    pool_pos = 0
                    need_pool = False

            elif current_method in ('mcmc', 'slice'):
                if need_pool:
                    # Multi-generation prefetch is exact only when every
                    # live loglike is f32-representable (the device's
                    # consumption state machine runs in f32; the cast is
                    # monotonic, so min/argmin/compare decisions then
                    # match the host's f64 replay bit-for-bit). All-device
                    # pipelines satisfy this by construction; host
                    # likelihoods returning true f64 values fall back to
                    # one dispatch per generation. The slice kernel shares
                    # the same buffer: at most one of 'mcmc'/'slice' ever
                    # runs (neither expires; first in the strategy wins),
                    # so buffered generations are always from the active
                    # kernel.
                    is_slice = current_method == 'slice'
                    active_d = (active_derived if self.num_derived > 0
                                else np.empty((self.num_live_points, 0)))
                    use_gen_batch = self.mesh is None and mcmc_gen_batch > 1
                    if use_gen_batch and not mcmc_gen_buffer:
                        al32 = active_logl.astype(np.float32)
                        use_gen_batch = bool(np.all(
                            al32.astype(np.float64) == active_logl))
                        if use_gen_batch and is_slice:
                            mcmc_gen_buffer = self._slice_generations_batch(
                                slice_steps, active_u, active_logl,
                                active_d, mcmc_num_chains, slice_width,
                                it, update_interval, max_iters,
                                mcmc_gen_batch,
                                max_expand=slice_max_expand,
                                max_shrink=slice_max_shrink,
                                speculate=mcmc_speculate,
                                adapt_cov=slice_adapt_cov)
                        elif use_gen_batch:
                            mcmc_gen_buffer = self._mcmc_generations_batch(
                                mcmc_steps, active_u, active_logl,
                                active_d, mcmc_num_chains, step_size, it,
                                update_interval, max_iters, mcmc_gen_batch,
                                dynamic_step_size=mcmc_dynamic_step_size,
                                speculate=mcmc_speculate,
                                adapt_cov=mcmc_adapt_cov)
                    if use_gen_batch and mcmc_gen_buffer:
                        out_g, g_loglstar, g_it, _ = mcmc_gen_buffer.pop(0)
                        if g_it != it or \
                                g_loglstar != float(np.float32(loglstar)):
                            raise RuntimeError(
                                'MCMC generation prefetch desync: device '
                                'simulated (it=%d, loglstar=%r), host '
                                'replay is at (it=%d, loglstar=%r)' % (
                                    g_it, g_loglstar, it,
                                    float(np.float32(loglstar))))
                        from nnest_tpu.utils.evaluation import (
                            metropolis_mix_null, slice_mix_null,
                            latent_cond_null)
                        g_null = (slice_mix_null(slice_steps, self.x_dim)
                                  if is_slice else
                                  metropolis_mix_null(
                                      mcmc_steps, self.x_dim,
                                      adapt_cov=mcmc_adapt_cov))
                        (u_f, logl_f, derived_f, moved, mcmc_scale,
                         mean_jump, nc) = self._consume_endpoint_out(
                            out_g, mix_null=g_null,
                            cond_null=latent_cond_null(self.x_dim,
                                                       mcmc_num_chains),
                            cond_inflates=not is_slice)
                    elif self.mesh is None and is_slice:
                        (u_f, logl_f, derived_f, moved, mcmc_scale,
                         mean_jump, nc) = self._slice_sample_live(
                            slice_steps, active_u, active_logl, active_d,
                            mcmc_num_chains, loglstar, slice_width,
                            max_expand=slice_max_expand,
                            max_shrink=slice_max_shrink,
                            adapt_cov=slice_adapt_cov)
                    elif self.mesh is None:
                        # Fused single-dispatch path: index draw + live-
                        # point selection + projection + chain scan in one
                        # device program (bit-identical trajectories to
                        # the unfused route below — same key roles, exact
                        # one-hot selection).
                        (u_f, logl_f, derived_f, moved, mcmc_scale,
                         mean_jump, nc) = self._mcmc_sample_live(
                            mcmc_steps, active_u, active_logl,
                            active_derived if self.num_derived > 0 else
                            np.empty((self.num_live_points, 0)),
                            mcmc_num_chains, loglstar, step_size,
                            dynamic_step_size=mcmc_dynamic_step_size,
                            adapt_cov=mcmc_adapt_cov)
                    else:
                        # mesh route: explicit dp-sharded chain batches.
                        # With cov adaptation the start indices and the
                        # red-black covariance mask come from the SAME
                        # key-role ops as the fused kernels
                        # (kernels.live_split), so the two routes draw
                        # identical starts and covariance halves — and the
                        # covariance never sees the chains' own starts
                        # (the measured full-set adaptation bias,
                        # kernels._latent_cov_chol).
                        gen_adapt_cov = (slice_adapt_cov if is_slice
                                         else mcmc_adapt_cov)
                        cov_mask = None
                        if gen_adapt_cov:
                            idx_dev, mask_dev = self.kernels.live_split(
                                self._next_key(), self.num_live_points,
                                mcmc_num_chains)
                            idx, cov_mask = jax.device_get(
                                (idx_dev, mask_dev))
                            idx = np.asarray(idx)
                            cov_mask = np.asarray(cov_mask, bool)
                        else:
                            idx = np.asarray(_randint(
                                self._next_key(), mcmc_num_chains,
                                self.num_live_points))
                        init_samples = active_u[idx, :]
                        init_loglikes = active_logl[idx]
                        init_derived = (active_derived[idx, :]
                                        if self.num_derived > 0 else
                                        np.empty((mcmc_num_chains, 0)))
                        if is_slice:
                            (u_f, logl_f, derived_f, moved, mcmc_scale,
                             mean_jump, nc) = self._slice_sample_final(
                                slice_steps, slice_width,
                                init_samples=init_samples,
                                init_loglikes=init_loglikes,
                                init_derived=init_derived,
                                loglstar=loglstar,
                                max_expand=slice_max_expand,
                                max_shrink=slice_max_shrink,
                                stat_moments=(np.mean(active_u, axis=0),
                                              np.var(active_u, axis=0)),
                                cov_from=(
                                    active_u.astype(np.float32)
                                    if slice_adapt_cov else None),
                                cov_mask=cov_mask)
                        else:
                            (u_f, logl_f, derived_f, moved, mcmc_scale,
                             mean_jump, nc) = self._mcmc_sample_final(
                                mcmc_steps, init_samples=init_samples,
                                init_loglikes=init_loglikes,
                                init_derived=init_derived,
                                loglstar=loglstar,
                                step_size=step_size,
                                dynamic_step_size=mcmc_dynamic_step_size,
                                stat_moments=(np.mean(active_u, axis=0),
                                              np.var(active_u, axis=0)),
                                cov_from=(
                                    active_u.astype(np.float32)
                                    if mcmc_adapt_cov else None),
                                cov_mask=cov_mask)
                    # Chain endpoints are the candidates (nested.py:429-439:
                    # accept iff the chain moved and logl > loglstar).
                    pool = {'u': u_f[moved], 'logl': logl_f[moved],
                            'derived': derived_f[moved],
                            'mean_jump': mean_jump,
                            'stats': self._last_kernel_stats}
                    pool_pos = 0
                    need_pool = False

            # Consume the candidate pool (nested.py:375-385, 429-439). MCMC
            # candidates are chain endpoints already filtered by the
            # kernel's any-accept 'moved' flag, so one uniform consumption
            # path covers every strategy.
            if pool is not None:
                u = pool['u']
                n_rows = u.shape[0]
                while pool_pos < n_rows:
                    ib = pool_pos
                    pool_pos += 1
                    if pool_pos == n_rows:
                        need_pool = True
                    if pool['logl'][ib] > loglstar:
                        # Insertion-index diagnostic (Fowlie, Handley & Su
                        # 2020, arXiv:2006.03371; absent in the reference):
                        # rank of the replacement among the surviving
                        # n_live-1 points — Uniform{0..n_live-1} under
                        # exact constrained sampling. The -1 excludes the
                        # dead point (active_logl[worst] == loglstar <
                        # new logl). Computed before the in-place
                        # replacement below; f64 host arrays, lockstep
                        # across processes.
                        insertion_ranks.append(int(
                            np.sum(active_logl < pool['logl'][ib])) - 1)
                        active_u[worst] = u[ib, :]
                        active_v[worst] = self.transform(
                            active_u[worst])[0]
                        active_logl[worst] = pool['logl'][ib]
                        if self.num_derived > 0:
                            active_derived[worst] = \
                                pool['derived'][ib, :]
                        accept_point = True
                        break
                if n_rows == 0:
                    need_pool = True

            if accept_point:
                # Shrink prior volume (nested.py:458-464).
                logvol -= 1.0 / self.num_live_points
                logz_remain = np.max(active_logl) - it / self.num_live_points
                fraction_remain = np.logaddexp(logz, logz_remain) - logz
                it += 1
                if pbar is not None:
                    pbar.update(1)
                    if it % log_interval == 0:
                        pbar.set_postfix(logz='%.3f' % logz,
                                         loglstar='%.3g' % loglstar,
                                         ncall=self.total_calls,
                                         refresh=False)

                if self.single_or_primary_process:
                    # per-acceptance TensorBoard scalar: ~1 call per
                    # iteration; rides the serial IO worker (log_scalar is
                    # lock-guarded, so this is safe vs the triptych render
                    # thread too) to keep proto/serialization work off the
                    # sampling loop.
                    # default-arg binding: the worker may run this lambda
                    # many acceptances later, after these frame locals
                    # have been rebound — free-variable capture would log
                    # runs of duplicated latest values
                    self._submit_io(lambda v=float(logz), s=it:
                                    self.trainer.log_scalar('logz', v, s))

                if it > 0 and it % log_interval == 0 and \
                        self.single_or_primary_process:
                    self.logger.info(
                        'Step [%d] loglstar [%5.4e] maxlogl [%5.4e] logz '
                        '[%5.4e] vol [%6.5e] ncalls [%d] scale [%5.4f] mean '
                        'calls [%5.4f]' % (
                            it, loglstar, np.max(active_logl), logz,
                            expected_vol, self.total_calls, mcmc_scale,
                            mean_calls))
                    self._append_results_row(
                        it, loglstar, logz, fraction_remain, mcmc_scale,
                        pool, active_u)
                    # Checkpoint / chain rewrites are O(saved rows): at
                    # every log_interval the cumulative IO is quadratic in
                    # run length (66 s of a 723 s 50-D run). Spacing keyed
                    # to the LAST write (geometric cadence, ~10% growth) so
                    # it always fires regardless of log_interval/nlive
                    # ratios, and cumulative rewrite cost stays O(n log n).
                    # The cheap one-row results.csv append above keeps its
                    # full cadence; final artifacts always written at run
                    # end.
                    spacing = max(log_interval, last_io_it // 10)
                    if it - last_io_it >= spacing:
                        last_io_it = it
                        self.samples = np.asarray(saved_v)
                        self.weights = np.exp(
                            np.asarray(saved_logwt) - logz)
                        self.loglikes = np.asarray(saved_logl)
                        with self.timers.time('checkpoint_io'):
                            self._write_checkpoint(
                                it, active_u, active_v, active_logl,
                                active_derived, saved_v, saved_logl,
                                saved_logwt, logz, h, logvol,
                                fraction_remain, strategy, expired,
                                controller=controller_snapshot(),
                                pool_state=pool_state_snapshot(),
                                insertion_ranks=insertion_ranks,
                                saved_slots=saved_slots,
                                saved_u=saved_u)
                        with self.timers.time('chain_io'):
                            # Full chain.txt rewrite is O(saved rows) of
                            # pure text formatting — measured 10.9 s of a
                            # 54 s 20-D run when done inline. The three
                            # arrays above are fresh host copies
                            # (np.asarray/np.exp allocate), so the rewrite
                            # can ride the serial IO worker; _close_io
                            # drains before the final synchronous
                            # _save_samples, which therefore always wins.
                            self._submit_io(
                                lambda s=self.samples, ll=self.loglikes,
                                w=self.weights:
                                self._save_samples(s, ll, weights=w))

        if pbar is not None:
            pbar.close()
            self._run_pbar = None

        # Integrate the remaining live points (nested.py:487-496).
        logvol = -len(saved_v) / self.num_live_points - \
            np.log(self.num_live_points)
        for i in range(self.num_live_points):
            logwt = logvol + active_logl[i]
            logz_new = np.logaddexp(logz, logwt)
            h = (np.exp(logwt - logz_new) * active_logl[i]
                 + np.exp(logz - logz_new) * (h + logz) - logz_new)
            logz = logz_new
            if self.num_derived > 0:
                saved_v.append(np.concatenate(
                    (active_v[i], active_derived[i])))
            else:
                saved_v.append(np.array(active_v[i]))
            saved_logwt.append(logwt)
            saved_logl.append(active_logl[i])
            if saved_slots is not None:
                saved_slots.append(i)   # slot i's final point closes thread i
            if saved_u is not None:
                saved_u.append(np.array(active_u[i]))

        # join any in-flight async triptych render and background
        # checkpoint writes before declaring the run (and its artifacts)
        # complete
        self._join_plots()
        with self.timers.time('checkpoint_io'):
            self._close_io()

        self.logz = logz
        self.h = h
        self.logzerr = float(np.sqrt(h / self.num_live_points))
        self.niter = it + 1
        self.samples = np.asarray(saved_v)
        self.weights = np.exp(np.asarray(saved_logwt) - logz)
        self.loglikes = np.asarray(saved_logl)
        # u-space dead points aligned with loglikes/thread_slots (incl. the
        # final-live tail) — consumed by DynamicNestedSampler to seed
        # batches from the reconstructed live-at-threshold set.
        self.saved_u = None if saved_u is None else np.asarray(saved_u)

        # Insertion-index uniformity diagnostic (arXiv:2006.03371): ranks
        # are lockstep-identical on every process, so compute everywhere
        # and only write/log on the primary. Low p flags under-mixed
        # constrained sampling (the failure mode that biases logZ with
        # deceptively small error bars); the rolling variant catches
        # failures confined to one likelihood regime.
        from nnest_tpu.utils.evaluation import (bootstrap_logz_error,
                                                insertion_ks,
                                                rolling_insertion_ks)
        self.insertion_ranks = np.asarray(insertion_ranks, dtype=np.int64)
        self.insertion_statistic, self.insertion_p_value = insertion_ks(
            self.insertion_ranks, self.num_live_points)
        self.insertion_rolling_p_value, _ = rolling_insertion_ks(
            self.insertion_ranks, self.num_live_points)
        # Thread-bootstrap logZ error (Higson et al. 2019): a
        # non-parametric estimate of the sampling error; ratio to the
        # analytic sqrt(h/N) ~ 1 validates the error bar (cross-thread
        # correlation from under-mixing needs the multi-run
        # implementation-error estimate in analyse.py — see
        # bootstrap_logz_error's docstring for the measured limits).
        self.logzerr_bootstrap = None
        self.thread_slots = (None if saved_slots is None
                             else np.asarray(saved_slots, dtype=np.int64))
        if saved_slots is not None:
            with self.timers.time('diagnostics'):
                self.logzerr_bootstrap = bootstrap_logz_error(
                    np.asarray(saved_logl), np.asarray(saved_slots),
                    self.num_live_points)
        # Start-decorrelation (kernel mixing) flag: median over this run's
        # consumed mcmc/slice generations of the min-over-latent-dims MSD
        # ratio (kernels.mix_ratio_device). ~1 = endpoints forget their
        # start live point; << 1 = threads stay correlated with their
        # parents — the under-mixing regime where sqrt(h/N), the
        # insertion KS, AND the single-run bootstrap all under-report
        # (measured on the crippled mcmc_steps=2 run, BENCHMARKS.md
        # part 4). None when no chain kernel ran (pure-rejection runs,
        # which cannot under-mix).
        self.mixing_min_ratio = (
            float(np.median(self._mix_ratios)) if self._mix_ratios
            else None)
        # Eigenbasis variant (kernels.mix_moments_device + host eigh): min over the
        # start population's covariance eigendirections, each normalized
        # by its own eigenvalue. Unlike the coordinate min, this is not
        # confounded by dimension (measured: healthy 30-D Gaussian has
        # coordinate min 0.31 with exactly calibrated scatter) and
        # isolates a structurally slow principal direction (the curved
        # ridge) — the regime where the error bar actually under-covers.
        self.mixing_min_ratio_eig = (
            float(np.median(self._mix_ratios_eig)) if self._mix_ratios_eig
            else None)
        # Median latent condition number of chain-start populations: the
        # structural-anisotropy flag. Stays at the sample-covariance
        # noise floor when the flow whitens the problem; large (every
        # generation, at every step count) on curved degeneracies the
        # flow cannot whiten — the regime whose excess logZ scatter is
        # invisible to within-generation mixing statistics.
        self.latent_cond_median = (
            float(np.median(self._latent_conds)) if self._latent_conds
            else None)
        # Mixing-adjusted error bar. sqrt(h/N) (and the thread bootstrap)
        # assume the N live-point threads explore the constrained prior
        # independently; on curved degeneracies the flow cannot whiten
        # (20-D Rosenbrock) the live set stays collectively clustered and
        # seed scatter runs ~3-7x sqrt(h/N) at EVERY step count — a
        # failure no marginal test sees (insertion KS, single-run
        # bootstrap both measured blind, BENCHMARKS.md parts 4 + round 4).
        # The calibrated single-run predictor is the RELATIVE eigenbasis
        # mixing ratio R = median(r_eig / kernel_null): r_eig is the
        # min-over-eigendirections start-decorrelation of each pool
        # generation, and kernel_null the value healthy (scatter ==
        # sqrt(h/N)) Gaussian controls achieve at the same step budget
        # (utils/evaluation.metropolis_mix_null / slice_mix_null).
        # Measured inflation (BENCHMARKS.md round 4) follows 1/R^2:
        #   g10     R 1.00 needed 1.13 | g30      R 1.07 needed 1.02
        #   rb20@5d R 0.41 needed 6.7  | rb20@50d R 0.56 needed 3.2
        # (the d-confounded coordinate ratio and the raw 1/sqrt(r) law
        # both failed the 30-D control). Quoted logzerr keeps the
        # reference's sqrt(h/N) contract
        # (/root/reference/nnest/nested.py:506); this field is the
        # corrected single-run uncertainty. Capped at 100x: below
        # R ~ 0.1 the run is broken, not merely wide. The adjustment is
        # applied only inside its calibration domain, x_dim >= 8 (all
        # calibration regimes are 10-50-D at the production chain
        # widths): low-D curved problems measure R << 1 yet calibrate
        # at or BELOW sqrt(h/N) (2-D Rosenbrock seed scatter 0.063 vs
        # sigma 0.22 — unimodal, ridge densely covered by the live
        # set), so inflating there would be pure over-coverage. The
        # diagnostic fields are recorded at every dim regardless.
        # Round-5 addition: the STRUCTURAL term. Curved degeneracies the
        # flow cannot whiten keep the chain-start latent condition number
        # 3-6x above the healthy Marchenko-Pastur-floor null at EVERY
        # step count (20-D Rosenbrock: 14-20 vs null ~4) while the
        # kinetic mixing ratio reads healthy once the proposal is
        # covariance-preconditioned — the regime where the round-4
        # kinetic-only law under-covered (measured 6.4x at cov@100,
        # BENCHMARKS.md round 5). The adjusted bar takes the LARGER of
        # the kinetic 1/R^2 and structural cond/null inflations; the
        # structural inflation feeds from METROPOLIS generations only
        # (slice's kinetic term alone calibrates on the same geometry —
        # round-4 slice@100/@400 both in band) while the diagnostic
        # ratio/flag covers both kernels.
        from nnest_tpu.utils.evaluation import adjusted_logzerr
        self.mixing_rel_ratio = (
            float(np.median(self._mix_rels)) if self._mix_rels else None)
        self.latent_cond_rel = (
            float(np.median(self._cond_rels)) if self._cond_rels else None)
        self.logzerr_adjusted = adjusted_logzerr(
            self.logzerr, self._mix_rels, self.x_dim,
            cond_rels=self._cond_infl)
        # One-glance run verdict: the union of every single-run warning
        # (each also logged individually below). Empty = no diagnostic
        # fired; measured blind spots remain (rare multi-nat ridge
        # misses can pass all three — BENCHMARKS.md round 4; run
        # multiple seeds and analyse.py's error decomposition for
        # those), so 'ok' means "no evidence of failure", not proof.
        self.run_quality_flags = []
        if (self.mixing_rel_ratio is not None and self.x_dim >= 8
                and self.mixing_rel_ratio < 0.7):
            self.run_quality_flags.append('under_mixed')
        if (self.latent_cond_rel is not None and self.x_dim >= 8
                and self.latent_cond_rel > 2.0):
            self.run_quality_flags.append('structural_anisotropy')
        if (self.insertion_p_value < 0.01
                or self.insertion_rolling_p_value < 0.01):
            self.run_quality_flags.append('nonuniform_insertion')
        if self.logzerr_bootstrap is not None:
            rb = self.logzerr_bootstrap / max(self.logzerr, 1e-12)
            if rb > 2.0 or rb < 0.5:
                self.run_quality_flags.append('bootstrap_mismatch')

        if self.single_or_primary_process and self.logs is not None:
            np.save(os.path.join(self.logs['results'],
                                 'insertion_ranks.npy'),
                    self.insertion_ranks.astype(np.uint32))
            if self.thread_slots is not None:
                # (death logl, thread slot) record: with n_live this is the
                # full (birth, death) representation of the run (births are
                # recoverable per slot — utils/evaluation.thread_birth_logl),
                # enabling exact cross-run merging and dynamic batches
                # (arXiv:1704.03459). float64 logl: chain.txt's %.5E text
                # round-trip is too coarse for evidence recomputation.
                extra = ({'u': np.asarray(saved_u, np.float64)}
                         if saved_u is not None else {})
                np.savez(os.path.join(self.logs['results'], 'threads.npz'),
                         logl=np.asarray(saved_logl, np.float64),
                         slots=self.thread_slots.astype(np.uint32),
                         n_live=np.int64(self.num_live_points),
                         birth_floor=np.float64(self._birth_floor),
                         **extra)
            with open(os.path.join(self.logs['results'],
                                   'diagnostics.json'), 'w') as f:
                json.dump({
                    'insertion_D': self.insertion_statistic,
                    'insertion_p': self.insertion_p_value,
                    'insertion_rolling_p': self.insertion_rolling_p_value,
                    'logzerr': self.logzerr,
                    'logzerr_bootstrap': self.logzerr_bootstrap,
                    'n_ranks': int(self.insertion_ranks.size),
                    'mixing_min_ratio': self.mixing_min_ratio,
                    'mixing_min_ratio_eig': self.mixing_min_ratio_eig,
                    'mixing_rel_ratio': self.mixing_rel_ratio,
                    'latent_cond_median': self.latent_cond_median,
                    'latent_cond_rel': self.latent_cond_rel,
                    'n_mix_windows': len(self._mix_ratios),
                    'logzerr_adjusted': self.logzerr_adjusted,
                    'quality_flags': self.run_quality_flags,
                }, f)
            with open(os.path.join(self.logs['results'], 'final.csv'),
                      'w') as f:
                w = csv.writer(f)
                w.writerow(['niter', 'ncall', 'logz', 'logzerr', 'h'])
                w.writerow([it + 1, self.total_calls, logz, self.logzerr, h])
            self._save_samples(self.samples, self.loglikes,
                               weights=self.weights)
        if self.single_or_primary_process:
            self.logger.info(
                'niter: %d\n ncall: %d\n nsamples: %d\n logz: %6.3f +/- '
                '%6.3f\n h: %6.3f' % (it + 1, self.total_calls,
                                      len(saved_v), logz, self.logzerr, h))
            self.logger.info(
                'Insertion-index KS: D [%5.4f] p [%5.4g] rolling p '
                '[%5.4g] over [%d] ranks%s' % (
                    self.insertion_statistic, self.insertion_p_value,
                    self.insertion_rolling_p_value,
                    self.insertion_ranks.size,
                    ' — WARNING: non-uniform insertion ranks suggest '
                    'under-mixed constrained sampling; increase '
                    'mcmc_steps' if self.insertion_p_value < 0.01 else ''))
            if self.logzerr_bootstrap is not None:
                ratio = self.logzerr_bootstrap / max(self.logzerr, 1e-12)
                self.logger.info(
                    'Bootstrap logZ error (thread-resampled): %5.4f vs '
                    'sqrt(h/N) %5.4f (ratio %4.2f)%s' % (
                        self.logzerr_bootstrap, self.logzerr, ratio,
                        ' — WARNING: bootstrap error far from the '
                        'analytic bar; the quoted logZ uncertainty is '
                        'mis-calibrated' if ratio > 2.0 or ratio < 0.5
                        else ''))
            if self.mixing_rel_ratio is not None:
                self.logger.info(
                    'Kernel mixing (eigenbasis start decorrelation '
                    'relative to healthy null): [%4.2f] over [%d] '
                    'generations%s' % (
                        self.mixing_rel_ratio, len(self._mix_rels),
                        ' — WARNING: the slowest latent direction '
                        'decorrelates far below what a whitened run '
                        'achieves at this step budget (curved '
                        'degeneracy / unwhitened slow mode); logzerr '
                        'likely UNDER-covers — use logzerr_adjusted, '
                        'and prefer slice_adapt=\'cov\' slice sampling '
                        'or more steps'
                        if (self.mixing_rel_ratio < 0.7
                            and self.x_dim >= 8) else ''))
                if self.latent_cond_rel is not None:
                    self.logger.info(
                        'Latent structure (chain-start condition number '
                        'relative to the healthy MP-floor null): '
                        '[%4.2f]%s' % (
                            self.latent_cond_rel,
                            ' — WARNING: the live set is collectively '
                            'anisotropic beyond what the flow whitens '
                            '(curved degeneracy); between-thread start '
                            'correlation inflates the true logZ scatter '
                            'at ANY step count — use logzerr_adjusted '
                            'and validate with a seed sweep'
                            if (self.latent_cond_rel > 2.0
                                and self.x_dim >= 8) else ''))
                if self.logzerr_adjusted > 1.5 * self.logzerr:
                    self.logger.info(
                        'Mixing-adjusted logZ error: %5.4f '
                        '(= logzerr x max(1/R^2, cond_rel) with R the '
                        'relative eigenbasis mixing ratio and cond_rel '
                        'the relative latent condition number, '
                        'calibrated in BENCHMARKS.md rounds 4-5; quoted '
                        'logzerr keeps the sqrt(h/N) convention)'
                        % self.logzerr_adjusted)
            self.logger.info(
                'Run quality: %s' % (
                    'ok (no single-run diagnostic fired)'
                    if not self.run_quality_flags
                    else 'SUSPECT [%s] — see the warnings above; '
                         'prefer logzerr_adjusted and validate with a '
                         'seed sweep (analyse.py error decomposition)'
                         % ', '.join(self.run_quality_flags)))
            phases = self.timers.summary()
            if phases:
                d = {k: round(v['total_s'], 2) for k, v in phases.items()}
                plot_s = getattr(self.trainer, 'plot_seconds', 0.0)
                if plot_s:
                    d['train_plot'] = round(plot_s, 2)
                self.logger.info('Phase timers: %s' % json.dumps(d))
        return self.logz

    # -------------------------------------------------------------- io

    def _append_results_row(self, it, loglstar, logz, fraction_remain,
                            scale, pool, active_u):
        if self.logs is None:
            return
        acceptance, ess_min, ess_max, jump = 0.0, 0.0, 0.0, 0.0
        total = self.total_accepted + self.total_rejected
        if total > 0:
            acceptance = self.total_accepted / total
        if pool is not None and 'mean_jump' in pool:
            jump = float(pool['mean_jump'])
        if pool is not None and 'stats' in pool:
            # Device-computed full-chain statistics from the last MCMC
            # kernel window (reference sampler.py:474-492: stats over all
            # chains of the current batch, not run-lifetime counters).
            st = pool['stats']
            acceptance = st['acceptance']
            jump = st['mean_jump']
            ess_min = float(np.min(st['ess']))
            ess_max = float(np.max(st['ess']))
        with open(os.path.join(self.logs['results'], 'results.csv'),
                  'a') as f:
            csv.writer(f).writerow(
                [it, acceptance, ess_min, ess_max, jump, scale, loglstar,
                 logz, fraction_remain, self.total_calls])

    @staticmethod
    def _compact_rejection_gen(x, ll, ds, ok, nev, mld, mr, loglstar, it,
                               trials):
        """Compress one raw rejection generation (trials-sized arrays +
        accept mask) into its consumable form: the ok-masked candidate
        rows plus bookkeeping scalars. Pops become pure bookkeeping and
        the buffer pickles directly into checkpoints, which is what makes
        mid-pool resume bit-exact without persisting 10-100 MB of raw
        trial arrays."""
        ok = np.asarray(ok)
        return {
            's': np.asarray(x)[ok],
            'll': np.asarray(ll, dtype=np.float64)[ok],
            'ds': np.asarray(ds, dtype=np.float64)[ok],
            'n_ok': int(ok.sum()),
            'nev': None if nev is None else int(nev),
            'mld': None if mld is None else float(mld),
            'mr': None if mr is None else float(mr),
            'loglstar': float(loglstar),
            'it': int(it),
            'trials': int(trials),
        }

    def _write_checkpoint(self, it, active_u, active_v, active_logl,
                          active_derived, saved_v, saved_logl, saved_logwt,
                          logz, h, logvol, fraction_remain, strategy,
                          expired, controller=None, pool_state=None,
                          insertion_ranks=None, saved_slots=None,
                          saved_u=None):
        """Snapshot checkpoint state on the calling thread (the live
        arrays mutate immediately after) and queue the file IO on the
        serial background writer — checkpoint IO measured ~1 s of a warm
        10-D run when written inline. Device pulls stay on the main
        thread (the tunnel is single-client): one small PRNG-key pull per
        write plus ``Trainer.host_params()``'s per-retrain memoized params
        pull. FIFO ordering preserves the corruption contract: data files
        first, the ``checkpoint_<it>.txt`` marker last, successive
        checkpoints never interleave (reference writes these inline,
        ``nested.py:473-507``)."""
        if not self.single_or_primary_process or self.logs is None:
            return
        ck = self.logs['checkpoint']
        snap = {
            'active_u': np.array(active_u),
            'active_v': np.array(active_v),
            'active_logl': np.array(active_logl),
            'active_derived': np.array(active_derived),
            'saved_v': np.asarray(saved_v),
            'saved_logl': np.asarray(saved_logl),
            'saved_logwt': np.asarray(saved_logwt),
            'rng_key': np.asarray(jax.random.key_data(self._key)),
            'params': (self.trainer.host_params()
                       if self.trainer.params is not None else None),
            'trainer_state': self.trainer.snapshot_state(),
            'pool_state': pool_state,
            'insertion_ranks': np.asarray(insertion_ranks or [],
                                          dtype=np.uint32),
            'saved_slots': (None if saved_slots is None else
                            np.asarray(saved_slots, dtype=np.uint32)),
            'saved_u': (None if saved_u is None
                        else np.asarray(saved_u, dtype=np.float64).reshape(
                            len(saved_u), self.x_dim)),
            'meta': {'logz': logz, 'h': h, 'logvol': logvol,
                     'ncall': self.total_calls,
                     'fraction_remain': fraction_remain,
                     'strategy': list(strategy),
                     'expired_strategies': list(expired),
                     # Proposal/ladder/envelope controller state: with it
                     # (and the trainer state above) a resume is
                     # bit-identical to the uninterrupted continuation
                     # when the checkpoint was written at a dispatch
                     # boundary (pool + prefetch buffers empty).
                     'controller': controller},
        }

        def write():
            for name in ('active_u', 'active_v', 'active_logl',
                         'active_derived'):
                np.save(os.path.join(ck, '%s_%s.npy' % (name, it)),
                        snap[name])
            for name in ('saved_v', 'saved_logl', 'saved_logwt'):
                np.save(os.path.join(ck, '%s.npy' % name), snap[name])
            if snap['saved_slots'] is not None:
                np.save(os.path.join(ck, 'saved_slots.npy'),
                        snap['saved_slots'])
            if snap['saved_u'] is not None:
                np.save(os.path.join(ck, 'saved_u.npy'), snap['saved_u'])
            # PRNG key + flow params + trainer state + in-flight pool
            # travel as ONE it-stamped file written atomically (tmp +
            # os.replace): they are only bit-exact-valid TOGETHER with the
            # checkpoint_<it> marker of the same iteration. Separate
            # unversioned files could pair iteration-N+1 state with the
            # iteration-N marker after a mid-write crash; atomic replace
            # guarantees the file is always one complete snapshot, and the
            # `it` stamp tells the loader whether it matches the marker
            # (mismatch degrades to statistically-exact resume).
            es_path = os.path.join(ck, 'exact_state.pkl')
            with open(es_path + '.tmp', 'wb') as f:
                pickle.dump({'it': it,
                             'rng_key': snap['rng_key'],
                             'params': snap['params'],
                             'trainer_state': snap['trainer_state'],
                             'pool_state': snap['pool_state'],
                             'insertion_ranks': snap['insertion_ranks']},
                            f)
            os.replace(es_path + '.tmp', es_path)
            with open(os.path.join(ck, 'checkpoint_%s.txt' % it),
                      'w') as f:
                json.dump(snap['meta'], f)

        self._submit_io(write)

    def _load_one_checkpoint(self, ck, it):
        """Load + validate a single checkpoint index; raises on any
        corruption (missing file, truncated npy, iteration/sample-count
        mismatch)."""
        with open(os.path.join(ck, 'checkpoint_%s.txt' % it)) as f:
            data = json.load(f)
        active_u = np.load(os.path.join(ck, 'active_u_%s.npy' % it))
        active_v = np.asarray(self.transform(active_u))
        active_logl = np.load(os.path.join(ck, 'active_logl_%s.npy' % it))
        active_derived = np.load(os.path.join(ck,
                                              'active_derived_%s.npy' % it))
        saved_v = [np.asarray(r) for r in
                   np.load(os.path.join(ck, 'saved_v.npy'))]
        saved_logl = list(np.load(os.path.join(ck, 'saved_logl.npy')))
        saved_logwt = list(np.load(os.path.join(ck, 'saved_logwt.npy')))
        # The cumulative saved_* arrays are written on the same cadence as
        # the per-iteration files; a mismatch means this checkpoint was
        # interrupted mid-write. saved_* may be *ahead* of an older
        # checkpoint_<it> (they are overwritten in place) — truncate to it.
        if len(saved_logl) < it:
            raise ValueError(
                'checkpoint %d inconsistent: %d dead points saved'
                % (it, len(saved_logl)))
        saved_v, saved_logl, saved_logwt = (
            saved_v[:it], saved_logl[:it], saved_logwt[:it])
        # Thread-id history (bootstrap error estimator). Written on the
        # same cadence as the other saved_* arrays; shorter-than-it or
        # absent (legacy checkpoint) disables the diagnostic.
        self._restored_saved_slots = None
        sl_path = os.path.join(ck, 'saved_slots.npy')
        if os.path.exists(sl_path):
            try:
                sl = np.load(sl_path)
                if len(sl) >= it:
                    self._restored_saved_slots = [int(x)
                                                  for x in sl[:it]]
            except Exception as e:
                self.logger.warning(
                    'Could not restore thread ids (%s); bootstrap '
                    'error diagnostic disabled for this run' % e)
        # u-space dead points (dynamic-batch seeding): same cadence as the
        # other saved_* arrays; absent/short disables saved_u for this run.
        self._restored_saved_u = None
        su_path = os.path.join(ck, 'saved_u.npy')
        if os.path.exists(su_path):
            try:
                su = np.load(su_path)
                if len(su) >= it:
                    self._restored_saved_u = np.array(su[:it])
            except Exception as e:
                self.logger.warning(
                    'Could not restore saved_u (%s); dead-point u record '
                    'disabled for this run' % e)
        if active_logl.shape[0] != active_u.shape[0]:
            raise ValueError('checkpoint %d: live-point arrays disagree' % it)
        # total_calls is a *global* count on every process here (kernel
        # ncall is an SPMD-global reduction) — unlike the reference's
        # per-rank MPI accounting (nested.py:182-183), no division by
        # process count.
        self.total_calls = int(data['ncall'])
        pool_state = self._restore_exact_state(ck, it)
        return (it, active_u, active_v, active_logl, active_derived,
                saved_v, saved_logl, saved_logwt, data['logz'], data['h'],
                data['logvol'], data['fraction_remain'], data['strategy'],
                data['expired_strategies'], data.get('controller'),
                pool_state)

    # Canonical method keys for fixed-size multi-process encoding.
    # 'slice' appended (checkpoint headers encode strategy entries by
    # index into this tuple — append-only to keep old checkpoints valid).
    _METHODS = ('rejection_prior', 'rejection_flow', 'density_flow',
                'mcmc', 'slice')
    _MAX_STRATEGIES = 8

    def _load_checkpoint(self):
        """Resume entry point. Single-process: local scan. Multi-process:
        rank 0 scans its filesystem and the resume decision + full state is
        broadcast so every process stays in lockstep (the reference divides
        this job between rank-0 I/O and MPI bcast, ``nested.py:166-195``;
        here the broadcast is a JAX collective so it works without a shared
        filesystem)."""
        if self.mpi_size > 1:
            state = (self._load_checkpoint_local()
                     if self.single_or_primary_process else None)
            return self._sync_checkpoint_state(state)
        return self._load_checkpoint_local()

    def _sync_checkpoint_state(self, state):
        # broadcast_exact: the stock broadcast_one_to_all device_puts
        # float64 as float32 (x64 off), silently truncating live-point
        # logl / evidence accumulators / ncall>2^24 on every rank —
        # including rank 0, which would overwrite the exact state it just
        # loaded from disk.
        from jax.experimental import multihost_utils as mh
        from nnest_tpu.parallel.mesh import broadcast_exact
        M, MAXS = self._METHODS, self._MAX_STRATEGIES
        n_live, d, nd = self.num_live_points, self.x_dim, self.num_derived
        npar = self.num_params
        # layout: [flags/evidence 8][strategy MAXS][expired MAXS]
        #         [controller 14 + ncs tail 20]
        #         [trainer best_val/iters 2][pool-state byte length 1]
        #         [insertion-rank count 1][thread-ids flag 1]
        NCTRL, NTAIL = 14, 20
        header = np.full(8 + 2 * MAXS + NCTRL + NTAIL + 5, -1.0,
                         np.float64)
        coff = 8 + 2 * MAXS
        pool_bytes = b''
        if state is not None:
            (it, active_u, _av, active_logl, active_derived, saved_v,
             saved_logl, saved_logwt, logz, h, logvol, fraction_remain,
             strategy, expired, controller, pool_state) = state
            header[:8] = [1.0, it, self.total_calls, logz, h, logvol,
                          fraction_remain,
                          1.0 if self.trainer.params is not None else 0.0]
            for i, name in enumerate(strategy[:MAXS]):
                header[8 + i] = M.index(name)
            for i, name in enumerate(expired[:MAXS]):
                header[8 + MAXS + i] = M.index(name)
            if controller:
                c = controller
                header[coff:coff + NCTRL] = [
                    1.0,
                    c.get('mcmc_scale', 0.0), c.get('cur_trials', 0),
                    c.get('mean_calls', 0.0), c.get('env_gens', 0),
                    1.0 if c.get('max_log_det_j') is not None else 0.0,
                    c.get('max_log_det_j') or 0.0, c.get('max_r') or 0.0,
                    1.0 if c.get('first_time') else 0.0,
                    c.get('last_trained_it', -1),
                    c.get('total_accepted', 0),
                    c.get('total_rejected', 0),
                    c.get('last_io_it', 0), c.get('ncs_count', 0)]
                tail = list(c.get('ncs_tail', []))[-NTAIL:]
                header[coff + NCTRL:coff + NCTRL + len(tail)] = tail
            bv = self.trainer.best_validation_loss
            header[coff + NCTRL + NTAIL] = (np.nan if bv is None else bv)
            header[coff + NCTRL + NTAIL + 1] = self.trainer.total_iters
            if pool_state is not None:
                pool_bytes = pickle.dumps(pool_state)
            header[coff + NCTRL + NTAIL + 2] = len(pool_bytes)
            header[coff + NCTRL + NTAIL + 3] = len(
                getattr(self, '_restored_insertion_ranks', []))
            header[coff + NCTRL + NTAIL + 4] = (
                1.0 if getattr(self, '_restored_saved_slots', None)
                is not None else 0.0)
        header = np.asarray(broadcast_exact(header))
        if header[0] < 0.5:
            return None
        it = int(header[1])
        if state is None:
            active_u = np.zeros((n_live, d))
            active_logl = np.zeros(n_live)
            active_derived = np.zeros((n_live, max(nd, 0)))
            saved_v = np.zeros((it, npar))
            saved_logl = np.zeros(it)
            saved_logwt = np.zeros(it)
        payload = (np.asarray(active_u, np.float64),
                   np.asarray(active_logl, np.float64),
                   np.asarray(active_derived,
                              np.float64).reshape(n_live, -1),
                   np.asarray(saved_v, np.float64).reshape(it, npar),
                   np.asarray(saved_logl, np.float64),
                   np.asarray(saved_logwt, np.float64),
                   np.asarray(jax.random.key_data(self._key)))
        # np.array copies: broadcast outputs are read-only buffers, but the
        # run loop mutates the live-point arrays in place.
        (active_u, active_logl, active_derived, saved_v, saved_logl,
         saved_logwt, key_data) = jax.tree.map(
            lambda a: np.array(a, dtype=np.float64, copy=True)
            if np.asarray(a).dtype != np.uint32
            else np.asarray(a), broadcast_exact(payload))
        self._key = jax.random.wrap_key_data(
            key_data.astype(np.asarray(
                jax.random.key_data(self._key)).dtype))
        if header[7] > 0.5:
            self.trainer.ensure_init()
            self.trainer.params = mh.broadcast_one_to_all(
                self.trainer.params)
            # ensure_init consumes trainer PRNG splits on processes that
            # had no local flow file; re-sync so later train() calls stay
            # in lockstep.
            self.trainer._key = jax.random.wrap_key_data(
                np.asarray(mh.broadcast_one_to_all(
                    np.asarray(jax.random.key_data(self.trainer._key)))))
            # Adam moments: every process has the same pytree STRUCTURE
            # after ensure_init (broadcast needs that), so the primary's
            # restored optimizer state syncs exactly — retrains after a
            # bit-exact resume then match on every rank.
            if self.trainer._opt_state is not None:
                self.trainer._opt_state = mh.broadcast_one_to_all(
                    self.trainer._opt_state)
        self.total_calls = int(header[2])
        strategy = [M[int(i)] for i in header[8:8 + MAXS] if i >= 0]
        expired = [M[int(i)]
                   for i in header[8 + MAXS:8 + 2 * MAXS] if i >= 0]
        controller = None
        if header[coff] > 0.5:
            tail_len = min(int(header[coff + 13]), NTAIL)
            controller = {
                'mcmc_scale': float(header[coff + 1]),
                'cur_trials': int(header[coff + 2]),
                'mean_calls': float(header[coff + 3]),
                'env_gens': int(header[coff + 4]),
                'max_log_det_j': (float(header[coff + 6])
                                  if header[coff + 5] > 0.5 else None),
                'max_r': (float(header[coff + 7])
                          if header[coff + 5] > 0.5 else None),
                'first_time': header[coff + 8] > 0.5,
                'last_trained_it': int(header[coff + 9]),
                'total_accepted': int(header[coff + 10]),
                'total_rejected': int(header[coff + 11]),
                'last_io_it': int(header[coff + 12]),
                'ncs_count': int(header[coff + 13]),
                'ncs_tail': [float(x) for x in
                             header[coff + NCTRL:coff + NCTRL + tail_len]],
            }
        bv = float(header[coff + NCTRL + NTAIL])
        self.trainer.best_validation_loss = None if np.isnan(bv) else bv
        ti = header[coff + NCTRL + NTAIL + 1]
        if ti >= 0:
            self.trainer.total_iters = int(ti)
        # In-flight pool + prefetch buffers: pickled on rank 0, shipped as
        # a uint8 payload (ints ride broadcast collectives exactly).
        n_pool = int(header[coff + NCTRL + NTAIL + 2])
        pool_state = None
        if n_pool > 0:
            payload = (np.frombuffer(pool_bytes, np.uint8)
                       if state is not None else np.zeros(n_pool, np.uint8))
            payload = np.asarray(mh.broadcast_one_to_all(payload))
            pool_state = pickle.loads(payload.tobytes())
        # Insertion-rank history: small ints, exact in f64; every process
        # carries the full history so the end-of-run KS diagnostic is
        # lockstep-identical.
        n_ranks = int(header[coff + NCTRL + NTAIL + 3])
        if n_ranks > 0:
            rpay = (np.asarray(self._restored_insertion_ranks, np.float64)
                    if state is not None else np.zeros(n_ranks, np.float64))
            rpay = np.asarray(broadcast_exact(rpay))
            self._restored_insertion_ranks = [int(x) for x in rpay]
        else:
            self._restored_insertion_ranks = []
        # Thread ids: length is always `it` when present (one per death).
        if header[coff + NCTRL + NTAIL + 4] > 0.5 and it > 0:
            spay = (np.asarray(self._restored_saved_slots, np.float64)
                    if state is not None else np.zeros(it, np.float64))
            spay = np.asarray(broadcast_exact(spay))
            self._restored_saved_slots = [int(x) for x in spay]
        elif header[coff + NCTRL + NTAIL + 4] > 0.5:
            self._restored_saved_slots = []
        else:
            self._restored_saved_slots = None
        active_v = np.asarray(self.transform(active_u), dtype=np.float64)
        return (it, active_u, active_v, active_logl, active_derived,
                [np.asarray(r) for r in saved_v], list(saved_logl),
                list(saved_logwt), float(header[3]), float(header[4]),
                float(header[5]), float(header[6]), strategy, expired,
                controller, pool_state)

    def _load_checkpoint_local(self):
        """Resume scan (reference nested.py:166-195), extended with flow
        params + PRNG state for exact resume. A corrupted newest checkpoint
        falls back to the next older one instead of failing the run."""
        if not self.resume or self.logs is None or self.logs['created']:
            return None
        its = []
        for fpath in glob.glob(os.path.join(self.logs['checkpoint'],
                                            'checkpoint_*.txt')):
            its.append(int(os.path.basename(fpath)
                           .split('checkpoint_')[1].split('.txt')[0]))
        ck = self.logs['checkpoint']
        state = None
        for it in sorted(its, reverse=True):
            try:
                state = self._load_one_checkpoint(ck, it)
                break
            except Exception as e:
                self.logger.warning(
                    'Checkpoint %d unusable (%s); trying an older one'
                    % (it, e))
        return state

    def _restore_exact_state(self, ck, it):
        """Restore PRNG key / flow params / trainer state from the atomic
        ``exact_state.pkl`` and return the in-flight pool state (or None).

        Called at the end of :meth:`_load_one_checkpoint`, after the
        marker + live/dead arrays validated. The file is written with
        tmp+``os.replace`` so it is always one complete snapshot; its
        ``it`` stamp decides the guarantee level:

        - stamp == marker iteration → bit-exact resume (pool restored);
        - stamp != marker (crash landed between the exact-state replace
          and the marker write, or we fell back to an older marker) →
          the key/params/trainer state are still VALID (any fixed flow
          keeps the latent kernels exact; the key is a fresh valid PRNG
          state) so they are restored, but the pool is discarded and the
          resume is only statistically exact.

        Legacy per-file checkpoints (``rng_key.npy``/``flow_params.pkl``/
        ``trainer_state.pkl``/``pool_state.pkl``) from older versions are
        loaded when ``exact_state.pkl`` is absent."""
        self._restored_insertion_ranks = []
        es_path = os.path.join(ck, 'exact_state.pkl')
        if os.path.exists(es_path):
            try:
                with open(es_path, 'rb') as f:
                    es = pickle.load(f)
            except Exception as e:
                self.logger.warning(
                    'Could not read exact state (%s); resume is '
                    'statistically (not bit-) exact' % e)
                return None
            try:
                self._key = jax.random.wrap_key_data(
                    np.asarray(es['rng_key']))
                if es.get('params') is not None:
                    self.trainer.load_params(es['params'])
                # Restored AFTER load_params, which resets the optimizer.
                if es.get('trainer_state') is not None:
                    self.trainer.restore_state(es['trainer_state'])
            except Exception as e:
                self.logger.warning(
                    'Could not restore trainer/PRNG state (%s); resume '
                    'is statistically (not bit-) exact' % e)
                return None
            # One rank per accepted iteration (append-only), so the first
            # `it` entries are exact even when the snapshot is from a
            # newer interrupted iteration (stamp mismatch below).
            self._restored_insertion_ranks = [
                int(x) for x in
                np.asarray(es.get('insertion_ranks', []))[:it]]
            if es.get('it') == it:
                return es.get('pool_state')
            self.logger.warning(
                'Exact state is from iteration %s but the newest usable '
                'checkpoint is %d; resume is statistically (not bit-) '
                'exact' % (es.get('it'), it))
            return None
        # ---- legacy per-file format (pre-atomic checkpoints) ----
        key_path = os.path.join(ck, 'rng_key.npy')
        if os.path.exists(key_path):
            try:
                self._key = jax.random.wrap_key_data(np.load(key_path))
            except Exception as e:
                self.logger.warning('Could not restore PRNG key (%s)' % e)
        flow_path = os.path.join(ck, 'flow_params.pkl')
        if os.path.exists(flow_path):
            try:
                self.trainer.load(flow_path)
            except Exception as e:
                self.logger.warning('Could not restore flow params (%s); '
                                    'flow will retrain' % e)
        tstate_path = os.path.join(ck, 'trainer_state.pkl')
        if os.path.exists(tstate_path):
            try:
                with open(tstate_path, 'rb') as f:
                    self.trainer.restore_state(pickle.load(f))
            except Exception as e:
                self.logger.warning(
                    'Could not restore trainer state (%s); resume is '
                    'statistically (not bit-) exact' % e)
        ps_path = os.path.join(ck, 'pool_state.pkl')
        if os.path.exists(ps_path):
            try:
                with open(ps_path, 'rb') as f:
                    ps = pickle.load(f)
                if ps is not None and ps.get('it') == it:
                    return ps
            except Exception as e:
                self.logger.warning(
                    'Could not restore pool state (%s); resume is '
                    'statistically (not bit-) exact' % e)
        return None
