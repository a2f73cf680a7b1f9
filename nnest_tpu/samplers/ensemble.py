"""Ensemble sampler: affine-invariant ensemble MCMC in flow latent space.

Equivalent of the reference ``EnsembleSampler`` (``nnest/ensemble.py:20-231``)
with the emcee dependency replaced by a native, fully vectorized stretch-move
kernel (kernels.py) so the whole walker trajectory is one compiled program:

- ``bootstrap()``: plain ensemble run in REAL space → autocorrelation
  thinning → iterate [train flow → latent-space ensemble → re-thin]
  (reference ``ensemble.py:81-184``; autocorr thinning replaces
  ``emcee.get_autocorr_time``; the between-round re-thin is the getdist
  ``makeSingleSamples(single_thin=thin)`` unit-weight Bernoulli draw,
  reimplemented seeded — see ``_make_single_samples``).
- ``run()``: normalize training samples, train, one latent ensemble run
  (reference ``ensemble.py:186-231``).
"""

from __future__ import annotations

import glob
import logging
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from nnest_tpu.samplers.base import Sampler
from nnest_tpu.utils.evaluation import integrated_autocorr_time


def real_space_stretch(log_prob_fn, key, x0, mcmc_steps, a=2.0):
    """Generic Goodman–Weare stretch ensemble on an arbitrary pure-JAX
    log-prob (used for the real-space bootstrap phase, reference
    ``ensemble.py:115-143``). Returns chains (walkers, steps+1, dim) and
    log-probs."""
    num_walkers, dim = x0.shape
    half = num_walkers // 2
    assert num_walkers % 2 == 0

    def half_update(xs_move, xs_other, lp_move, k):
        kz, kc, ku = jax.random.split(k, 3)
        n = xs_move.shape[0]
        u = jax.random.uniform(kz, (n,))
        zeta = ((a - 1.0) * u + 1.0) ** 2 / a
        # gather-free partner selection (row gathers are scalar loops on
        # TPU); elementwise masked sum — a one-hot MATMUL would
        # bf16-truncate the partners on the MXU (see samplers/kernels.py)
        idx = jax.random.randint(kc, (n,), 0, xs_other.shape[0])
        kiota = jax.lax.broadcasted_iota(jnp.int32,
                                         (n, xs_other.shape[0]), 1)
        onehot = (kiota == idx[:, None]).astype(xs_other.dtype)
        partner = jnp.sum(onehot[:, :, None] * xs_other[None, :, :],
                          axis=1)
        prop = partner + zeta[:, None] * (xs_move - partner)
        lp_prop = log_prob_fn(prop)
        log_ratio = (dim - 1.0) * jnp.log(zeta) + lp_prop - lp_move
        acc = jax.random.uniform(ku, (n,)) < jnp.exp(
            jnp.minimum(log_ratio, 0.0))
        return (jnp.where(acc[:, None], prop, xs_move),
                jnp.where(acc, lp_prop, lp_move), acc)

    def step(carry, k):
        x, lp = carry
        k1, k2 = jax.random.split(k)
        x_a, lp_a, acc_a = half_update(x[:half], x[half:], lp[:half], k1)
        x_b, lp_b, acc_b = half_update(x[half:], x_a, lp[half:], k2)
        x = jnp.concatenate([x_a, x_b], 0)
        lp = jnp.concatenate([lp_a, lp_b], 0)
        n_acc = jnp.sum(acc_a.astype(jnp.int32)) + \
            jnp.sum(acc_b.astype(jnp.int32))
        return (x, lp), (x, lp, n_acc)

    lp0 = log_prob_fn(x0)
    keys = jax.random.split(key, mcmc_steps)
    _, (xs, lps, n_accs) = jax.lax.scan(step, (x0, lp0), keys)
    chains = jnp.swapaxes(jnp.concatenate([x0[None], xs], 0), 0, 1)
    lp_chain = jnp.swapaxes(jnp.concatenate([lp0[None], lps], 0), 0, 1)
    return chains, lp_chain, jnp.sum(n_accs)


class EnsembleSampler(Sampler):

    def __init__(self,
                 x_dim,
                 loglike,
                 prior=None,
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
                 base_dist=None,
                 scale='',
                 use_gpu=False,
                 trainer=None,
                 transform_prior=True,
                 oversample_rate=-1,
                 log_level=logging.INFO,
                 param_names=None,
                 seed=0,
                 mesh=None):
        if not hasattr(self, 'sampler'):
            self.sampler = 'ensemble'
        super().__init__(
            x_dim, loglike, prior=prior, append_run_num=append_run_num,
            hidden_dim=hidden_dim, num_slow=num_slow,
            num_derived=num_derived, batch_size=batch_size, flow=flow,
            num_blocks=num_blocks, num_layers=num_layers,
            learning_rate=learning_rate, log_dir=log_dir, use_gpu=use_gpu,
            base_dist=base_dist, scale=scale, trainer=trainer,
            transform_prior=transform_prior, oversample_rate=oversample_rate,
            log_level=log_level, param_names=param_names, seed=seed,
            mesh=mesh)
        if self.single_or_primary_process:
            self._save_params()

    # ------------------------------------------------------------ bootstrap

    def _bootstrap_save(self, phase, chains, training_samples):
        """Persist a completed bootstrap phase (the reference streams its
        initial run to an emcee HDF backend, ``ensemble.py:140-141``; here
        each phase is one compiled program, so persistence is per-phase:
        chains + thinned training set + PRNG state + likelihood counter)."""
        if self.logs is None or not self.single_or_primary_process:
            return
        np.savez(os.path.join(self.logs['checkpoint'],
                              'bootstrap_%d.npz' % phase),
                 chains=chains, training_samples=training_samples,
                 key_data=np.asarray(jax.random.key_data(self._key)),
                 total_calls=self.total_calls)
        # Cross-phase trainer state (flow params, Adam moments, trainer
        # PRNG key): phase N+1's train() warm-starts from phase N's
        # params/moments and consumes the trainer key stream, so without
        # this a resumed bootstrap diverges from the uninterrupted one.
        # Written AFTER the npz: a phase with npz but no trainer file
        # degrades to the historical statistically-exact resume.
        with open(os.path.join(self.logs['checkpoint'],
                               'bootstrap_%d_trainer.pkl' % phase),
                  'wb') as f:
            pickle.dump({'params': (self.trainer.host_params()
                                    if self.trainer.params is not None
                                    else None),
                         'state': self.trainer.snapshot_state()}, f)

    def _sync_bootstrap_state(self, loaded):
        """Broadcast the rank-0 resume decision + restored state to every
        process. Non-primary processes have ``self.logs is None`` (strict
        rank-0 run-dir ownership), so their local load always returns None;
        without this sync a resumed rank 0 would skip phases the others
        replay, with divergent PRNG streams — collectives would mismatch.
        Same pattern as ``NestedSampler._sync_checkpoint_state``;
        ``broadcast_exact`` keeps the float64 state (likelihood counter,
        training samples) bit-exact through the collective."""
        from nnest_tpu.parallel.mesh import broadcast_exact
        header = np.full(7, -1.0, np.float64)
        if loaded is not None:
            phase, ts = loaded
            header[:4] = [1.0, phase, ts.shape[0], self.total_calls]
            header[4] = 1.0 if self.trainer.params is not None else 0.0
            bv = self.trainer.best_validation_loss
            header[5] = np.nan if bv is None else bv
            header[6] = self.trainer.total_iters
        header = np.asarray(broadcast_exact(header))
        if header[0] < 0.5:
            return None
        n_rows = int(header[2])
        if loaded is not None:
            ts = np.asarray(loaded[1], np.float64)
        else:
            ts = np.zeros((n_rows, self.x_dim), np.float64)
        ts, key_data = broadcast_exact(
            (ts, np.asarray(jax.random.key_data(self._key))))
        self._key = jax.random.wrap_key_data(np.asarray(key_data))
        self.total_calls = int(header[3])
        # Trainer state rides collectives too (same reasons as
        # NestedSampler._sync_checkpoint_state): params + Adam moments as
        # pytree broadcasts after ensure_init gives every rank the same
        # structure; trainer key + early-stop scalars exactly.
        from jax.experimental import multihost_utils as mh
        if header[4] > 0.5:
            self.trainer.ensure_init()
            self.trainer.params = mh.broadcast_one_to_all(
                self.trainer.params)
            if self.trainer._opt_state is not None:
                self.trainer._opt_state = mh.broadcast_one_to_all(
                    self.trainer._opt_state)
        self.trainer._key = jax.random.wrap_key_data(
            np.asarray(mh.broadcast_one_to_all(
                np.asarray(jax.random.key_data(self.trainer._key)))))
        bv = float(header[5])
        self.trainer.best_validation_loss = None if np.isnan(bv) else bv
        if header[6] >= 0:
            self.trainer.total_iters = int(header[6])
        return int(header[1]), np.array(ts, dtype=np.float64, copy=True)

    def _bootstrap_load_latest(self, max_phase):
        """Return (phase, training_samples) of the newest RESTORABLE
        completed phase <= max_phase, restoring PRNG + counters, or None.
        A corrupted newest archive (crash mid-write) falls back to the
        next older phase instead of restarting the whole bootstrap — the
        same contract as NestedSampler's checkpoint scan."""
        if self.logs is None:
            return None
        phases = []
        for p in glob.glob(os.path.join(self.logs['checkpoint'],
                                        'bootstrap_*.npz')):
            base = os.path.basename(p)
            try:
                ph = int(base.split('_')[1].split('.npz')[0])
            except ValueError:
                continue
            if ph <= max_phase:
                phases.append((ph, p))
        best = None
        for ph, p in sorted(phases, reverse=True):
            try:
                # Load every field into locals BEFORE mutating self: npz
                # member reads are lazy, so a truncated archive can raise
                # on the 2nd or 3rd access — a half-restored PRNG key on
                # rank 0 with the seed key on other ranks would silently
                # desync the lockstep multi-process bootstrap.
                data = np.load(p)
                key_data = np.asarray(data['key_data'])
                total_calls = int(data['total_calls'])
                training_samples = np.asarray(data['training_samples'])
                best = (ph, p)
                break
            except Exception as e:
                self.logger.warning(
                    'Bootstrap checkpoint %s unusable (%s); trying an '
                    'older phase' % (p, e))
        if best is None:
            return None
        self._key = jax.random.wrap_key_data(key_data)
        self.total_calls = total_calls
        tpath = os.path.join(self.logs['checkpoint'],
                             'bootstrap_%d_trainer.pkl' % best[0])
        if os.path.exists(tpath):
            try:
                with open(tpath, 'rb') as f:
                    snap = pickle.load(f)
                if snap['params'] is not None:
                    # load_params routes through _canonical_placement: a
                    # default-device rebind under a mesh would compile a
                    # differently-partitioned train step and drift in the
                    # last ulp vs the uninterrupted run.
                    self.trainer.load_params(snap['params'])
                self.trainer.restore_state(snap['state'])
            except Exception as e:
                self.logger.warning(
                    'Could not restore bootstrap trainer state (%s); '
                    'resume is statistically (not bit-) exact' % e)
        return best[0], training_samples

    def bootstrap(self,
                  mcmc_steps,
                  num_walkers,
                  iters=1,
                  thin=10,
                  stats_interval=10,
                  output_interval=None,
                  initial_jitter=0.01,
                  final_jitter=0.01,
                  init_samples=None,
                  moves=None,
                  resume=False):
        """Alternate plain-ensemble and flow-guided latent-ensemble rounds
        (reference ``ensemble.py:81-184``). ``moves`` accepts the reference's
        {name: weight} dict with native 'stretch'/'de'/'snooker'/'kde'
        implementations (kernels.py). With ``resume=True``, completed phases
        found in the run's checkpoint dir are skipped."""

        start_phase = -1
        if resume:
            loaded = (self._bootstrap_load_latest(iters)
                      if self.single_or_primary_process else None)
            if self.mpi_size > 1:
                loaded = self._sync_bootstrap_state(loaded)
            if loaded is not None:
                start_phase, training_samples = loaded
                self.logger.info('Resumed bootstrap from phase [%d]'
                                 % start_phase)
                if start_phase >= iters:
                    return training_samples

        if start_phase < 0:
            # Seed phase 0 from an existing emcee HDF backend file: the
            # reference persists its initial real-space ensemble to
            # <log_dir>/emcee.h5 and reuses it on restart
            # (reference ensemble.py:114,140-141), so a migrating user's
            # file drops in here. Consumed read-only — the stored chain
            # replaces the phase-0 run (no additional emcee steps; the
            # native kernel takes over from phase 1). Multi-process:
            # only rank 0 owns the run dir (so only it can see the
            # file); the decision + thinned samples ride the SAME
            # broadcast as bootstrap resume — without it rank 0 would
            # skip phase 0 while the other ranks run it, desyncing key
            # streams (the resume path above documents the hazard).
            seeded = None
            h5 = (os.path.join(self.log_dir, 'emcee.h5')
                  if self.log_dir is not None else None)
            if self.single_or_primary_process and h5 is not None \
                    and os.path.isfile(h5):
                chains = self._load_emcee_h5(h5)
                self.logger.info(
                    'Seeding phase 0 from emcee.h5 (%d walkers x %d '
                    'stored iterations)' % chains.shape[:2])
                self._chain_stats(chains)
                tau = integrated_autocorr_time(chains)
                discard = min(int(2 * np.max(tau)), chains.shape[1] // 2)
                step_thin = max(int(0.5 * np.min(tau)), 1)
                ts = chains[:, discard::step_thin, :].reshape(
                    -1, self.x_dim)
                self._bootstrap_save(0, chains, ts)
                seeded = (0, ts)
            if self.mpi_size > 1:
                seeded = self._sync_bootstrap_state(seeded)
            if seeded is not None:
                start_phase, training_samples = seeded

        if start_phase < 0:
            # Phase 0: real-space ensemble (reference ensemble.py:137-143).
            if init_samples is None:
                if self.sample_prior is None:
                    raise ValueError('Prior does not have sample method')
                init_samples = self.sample_prior(num_walkers)
            init_samples = np.asarray(init_samples, dtype=np.float32)
            num_walkers = init_samples.shape[0]

            kern = self.kernels  # ensures jax closures exist
            like_fn, prior_fn = kern.like_fn, kern.prior_fn

            def log_prob(x):
                logl, _ = like_fn(x)
                return logl + prior_fn(x)

            self.logger.info(
                'Performing initial ensemble run with [%d] walkers'
                % num_walkers)
            run_fn = jax.jit(lambda key, x0: real_space_stretch(
                log_prob, key, x0, mcmc_steps))
            chains, lps, n_acc = run_fn(self._next_key(),
                                        jnp.asarray(init_samples))
            chains = np.asarray(chains, dtype=np.float64)
            self.total_calls += mcmc_steps * num_walkers
            self.logger.info('Initial acceptance [%5.4f]' % (
                float(n_acc) / (mcmc_steps * num_walkers)))
            self._chain_stats(chains)

            # Autocorrelation thinning (reference ensemble.py:146-147).
            tau = integrated_autocorr_time(chains)
            discard = min(int(2 * np.max(tau)), chains.shape[1] // 2)
            step_thin = max(int(0.5 * np.min(tau)), 1)
            training_samples = chains[:, discard::step_thin, :].reshape(
                -1, self.x_dim)
            self._bootstrap_save(0, chains, training_samples)
            start_phase = 0

        for it in range(start_phase + 1, iters + 1):
            if iters > 1:
                jitter = initial_jitter + (it - 1) * (
                    final_jitter - initial_jitter) / (iters - 1)
            else:
                jitter = initial_jitter

            mean = np.mean(training_samples, axis=0)
            std = np.std(training_samples, axis=0)
            normalized = (training_samples - mean) / std
            self.transform = lambda x: x * std + mean
            self.invalidate_kernels()
            self.trainer.train(normalized, jitter=jitter)

            samples, latent, derived, loglikes, ncall = \
                self._ensemble_sample(mcmc_steps, num_walkers,
                                      stats_interval=stats_interval,
                                      output_interval=output_interval,
                                      moves=moves)

            samples = self.transform(
                samples.reshape(-1, self.x_dim)).reshape(samples.shape)
            self._chain_stats(samples)
            training_samples = self._make_single_samples(samples, thin, it)
            self._bootstrap_save(it, samples, training_samples)

        self._join_plots()
        return training_samples

    def _load_emcee_h5(self, path):
        """Read an emcee ``HDFBackend`` file (group 'mcmc': datasets
        'chain' of shape (iteration, walkers, dim) and attr 'iteration')
        into the (walkers, iterations, dim) layout the bootstrap uses."""
        import h5py
        with h5py.File(path, 'r') as f:
            g = f['mcmc']
            n_it = int(g.attrs.get('iteration', g['chain'].shape[0]))
            chain = np.asarray(g['chain'][:n_it], np.float64)
        if n_it < 2 or chain.shape[0] < 2:
            # emcee creates the backend file on construction; a run
            # killed before stepping leaves iteration=0 (or 1) — nothing
            # usable to thin. Fail loudly rather than feed a 0-row chain
            # into the autocorrelation estimator.
            raise ValueError(
                'emcee.h5 at %s holds %d completed iterations — nothing '
                'to seed from (delete it to run the native phase 0)'
                % (path, n_it))
        if chain.ndim != 3 or chain.shape[2] != self.x_dim:
            raise ValueError(
                'emcee.h5 chain shape %r does not match x_dim=%d'
                % (chain.shape, self.x_dim))
        return np.transpose(chain, (1, 0, 2))

    def _make_single_samples(self, chains, thin, phase):
        """Unit-weight random re-thin of the bootstrap chains — parity
        with the reference's getdist draw
        ``MCSamples(...).makeSingleSamples(single_thin=thin)``
        (``/root/reference/nnest/ensemble.py:180-182``): row i survives
        with probability w_i / (max w · thin). Bootstrap chains are
        unit-weight, so this is Bernoulli(1/thin) random subsampling of
        the flattened chains — the next round's flow trains on an
        unbiased random draw rather than the round-4 stride
        ``samples[:, ::thin, :]`` (same marginal in expectation; the
        stride kept deterministic phase-aligned rows). The reference's
        draw is unseeded; here it derives from the sampler's CHECKPOINTED
        PRNG stream (one ``_next_key`` per re-thin — NOT the constructor
        seed, which deliberately differs on resume), so
        seed-reproducibility, bit-exact bootstrap resume and
        multi-process lockstep all hold. Degenerate draws (< 2·x_dim
        rows) fall back to the stride. ``phase`` is accepted for
        logging/debug symmetry with ``_bootstrap_save``."""
        del phase  # the key stream already encodes the phase position
        flat = chains.reshape(-1, self.x_dim)
        key_bits = np.asarray(
            jax.random.key_data(self._next_key())).astype(np.uint32)
        rng = np.random.default_rng([int(x) for x in key_bits.ravel()])
        keep = rng.uniform(size=flat.shape[0]) <= 1.0 / max(int(thin), 1)
        out = flat[keep]
        if out.shape[0] < 2 * self.x_dim:
            return chains[:, ::thin, :].reshape(-1, self.x_dim)
        return out

    # ------------------------------------------------------------------ run

    def run(self,
            mcmc_steps,
            num_walkers,
            training_samples,
            stats_interval=10,
            output_interval=None,
            initial_jitter=0.01,
            final_jitter=0.01,
            init_samples=None):
        """Train on provided samples, then one latent ensemble run
        (reference ``ensemble.py:186-231``)."""
        training_samples = np.asarray(training_samples, dtype=np.float64)
        mean = np.mean(training_samples, axis=0)
        std = np.std(training_samples, axis=0)
        normalized = (training_samples - mean) / std
        self.transform = lambda x: x * std + mean
        self.invalidate_kernels()
        self.trainer.train(normalized, jitter=initial_jitter)

        samples, latent, derived, loglikes, ncall = self._ensemble_sample(
            mcmc_steps, num_walkers, init_samples=init_samples,
            stats_interval=stats_interval, output_interval=output_interval)

        samples = self.transform(
            samples.reshape(-1, self.x_dim)).reshape(samples.shape)
        if mcmc_steps > 1:
            self._chain_stats(samples)

        self._join_plots()
        self.samples = np.concatenate((samples, derived), axis=2)
        self.latent_samples = latent
        self.loglikes = loglikes
        self.logger.info('ncall: {:d}\n'.format(self.total_calls))
        return self.samples
