"""Sampler base: user-callable wrapping, trainer, kernels, artifacts.

Equivalent of the reference ``Sampler`` (``nnest/sampler.py:29-527``) redesigned
for a device-resident execution model:

- User ``loglike``/``transform``/``prior`` are wrapped twice: a numpy-facing
  "safe" closure with batching/NaN-clamping/call-counting (mirroring
  ``sampler.py:100-163``), and a pure-JAX closure used *inside* jitted
  kernels. Pure-JAX likelihoods (anything with a per-point ``logpdf``, e.g.
  the bundled zoo) run fully fused on device; black-box Python likelihoods
  fall back to ``io_callback`` so the scan kernels still compile.
- MPI plumbing (``sampler.py:165-177``) is replaced by ``jax.distributed``
  process semantics: rank-0 I/O gating via ``jax.process_index() == 0``; the
  data parallelism itself lives in vectorized chains + device sharding
  (see nnest_tpu/parallel).
- The sampling kernels (`_mcmc_sample`, rejection/density/ensemble) keep the
  reference's host-facing signatures/returns but are single compiled
  programs per invocation (kernels.py) instead of per-step host loops.
"""

from __future__ import annotations

import json
import logging
import os

import jax
import jax.numpy as jnp
from jax.experimental import io_callback
import numpy as np

from nnest_tpu import runtime as _runtime
from nnest_tpu.samplers.kernels import LatentKernels
from nnest_tpu.training.trainer import Trainer
from nnest_tpu.utils.evaluation import (
    acceptance_rate, effective_sample_size, mean_jump_distance,
    gelman_rubin_diagnostic)
from nnest_tpu.utils.logger import create_logger, get_or_create_run_dir


from nnest_tpu.utils.rng import split_key as _split_key


def _is_jax_traceable(fn, example_shape):
    try:
        jax.eval_shape(fn, jax.ShapeDtypeStruct(example_shape, jnp.float32))
        return True
    except Exception:
        return False


def _host_batch_callback(host, row_shapes, mesh):
    """Wrap a host function mapping ``(n, d) -> tuple of (n, ...)`` arrays
    as a device function callable inside jit.

    - ``mesh is None``: one ordered ``io_callback`` (single-backend path,
      unchanged semantics).
    - ``mesh`` set: a shard_map farm over the mesh's 'dp' axis — each
      device's shard of the batch is evaluated by its OWNING process's
      host. This is the TPU-native equivalent of the reference's per-rank
      MPI likelihood farm (``nnest/nested.py:210-226``): under
      ``jax.distributed`` every process evaluates only its local rows, in
      parallel across hosts. (A plain ``io_callback(ordered=True)`` cannot
      lower under GSPMD — XLA rejects side-effecting HLOs with replicated
      token sharding — and a single-device callback would funnel every
      evaluation through rank 0.) The batch is padded to a multiple of dp
      by repeating row 0; padded rows are evaluated and discarded (trial
      accounting is host-side, so reported ncall is unaffected). With
      tp > 1 each dp shard is additionally evaluated once per tp replica;
      nested/ensemble meshes use tp=1.

    ``row_shapes``: tuple of ``(trailing_shape, dtype)`` per output, e.g.
    ``(((), jnp.float32), ((num_derived,), jnp.float32))``.
    """
    def fn(u):
        n = u.shape[0]
        if mesh is None:
            out = io_callback(
                host,
                tuple(jax.ShapeDtypeStruct((n,) + s, d)
                      for s, d in row_shapes),
                u, ordered=True)
            return (tuple(out) if isinstance(out, (tuple, list))
                    else (out,))
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        dp = mesh.shape['dp']
        pad = (-n) % dp
        up = (jnp.concatenate([u, jnp.repeat(u[:1], pad, axis=0)], axis=0)
              if pad else u)

        def shard_fn(us):
            m = us.shape[0]
            out = io_callback(
                host,
                tuple(jax.ShapeDtypeStruct((m,) + s, d)
                      for s, d in row_shapes),
                us)
            return (tuple(out) if isinstance(out, (tuple, list))
                    else (out,))

        out = shard_map(shard_fn, mesh=mesh, in_specs=P('dp'),
                        out_specs=tuple(P('dp') for _ in row_shapes))(up)
        return tuple(o[:n] for o in out) if pad else out
    return fn


class Sampler:

    def __init__(self,
                 x_dim,
                 loglike,
                 transform=None,
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
                 resume=True,
                 use_gpu=False,
                 base_dist=None,
                 scale='',
                 trainer=None,
                 transform_prior=True,
                 oversample_rate=-1,
                 log_level=logging.INFO,
                 param_names=None,
                 seed=0,
                 mesh=None):
        # Optional jax.sharding.Mesh: chain/trial batches are sharded over
        # its 'dp' axis so candidate generation scales across devices — the
        # TPU-native replacement for the reference's per-rank MPI candidate
        # fan-out (nested.py:416-427). Semantics are unchanged (same PRNG,
        # same program; SPMD is a layout choice).
        self.mesh = mesh
        self.x_dim = x_dim
        self.num_derived = num_derived
        self.num_params = x_dim + num_derived
        assert x_dim > num_slow
        self.num_slow = num_slow
        self.num_fast = x_dim - num_slow
        self.param_names = param_names
        if param_names is not None:
            assert len(param_names) == self.num_params
        self.oversample_rate = (oversample_rate if oversample_rate > 0
                                else self.num_fast / self.x_dim)

        # Capacity autoscale (round 5): hidden_dim=0/None derives the
        # conditioner width from x_dim. The round-4 roofline measured
        # every hot program latency-bound 16-660x above its compute/
        # memory roofline, so widening the conditioner is wall-free on
        # TPU — spend it where the flow must fit higher-dimensional
        # structure. Below 16-D the round-4 width is kept (the 10-D
        # 8-12 s warm wall is pinned in BENCHMARKS.md); an explicit
        # hidden_dim always wins.
        if not hidden_dim:
            hidden_dim = 16 if x_dim < 16 else (32 if x_dim < 32 else 64)

        self._user_loglike = loglike
        self._user_transform = transform
        self._user_prior = prior
        self._transform_prior = transform_prior

        self._key = jax.random.PRNGKey(seed)
        self._seed = seed

        # ------------------------------------------------- host transform
        if transform is None:
            def _transform_host(x):
                x = np.asarray(x)
                if x.ndim == 1:
                    x = x[None, :]
                return x
            self._transform_host = _transform_host
        else:
            def _transform_host(x):
                x = np.asarray(x)
                if x.ndim == 1:
                    assert x.shape[0] == self.x_dim
                    x = x[None, :]
                return np.asarray(transform(x))
            self._transform_host = _transform_host
        self.transform = self._transform_host

        # --------------------------------------------------- host loglike
        def safe_loglike(x):
            """Batched, NaN-safe, call-counting wrapper (reference
            ``sampler.py:110-135``)."""
            if isinstance(x, list):
                x = np.asarray(x)
            x = np.asarray(x, dtype=np.float64)
            if x.ndim == 1:
                assert x.shape[0] == self.x_dim
                x = x[None, :]
            res = loglike(self.transform(x))
            self.total_calls += x.shape[0]
            if isinstance(res, tuple):
                logl, derived = res
                logl = np.asarray(logl, dtype=np.float64)
                derived = np.asarray(derived, dtype=np.float64)
            else:
                logl = np.asarray(res, dtype=np.float64)
                derived = np.zeros((x.shape[0], self.num_derived))
            if logl.ndim == 0:
                logl = logl[None]
            logl[~np.isfinite(logl)] = -1e100
            if derived.ndim == 1:
                raise ValueError(
                    'Derived should have dimensions (batch, num_derived)')
            if derived.shape[1] != self.num_derived:
                raise ValueError('Is the number of derived parameters correct?')
            return logl, derived

        self.loglike = safe_loglike

        # ----------------------------------------------------- host prior
        self.sample_prior = getattr(prior, 'sample', None)
        if not callable(self.sample_prior):
            self.sample_prior = None

        if prior is None:
            self.prior = lambda x: np.zeros(np.atleast_2d(x).shape[0])
        else:
            def safe_prior(x):
                x = np.atleast_2d(np.asarray(x, dtype=np.float64))
                if transform_prior:
                    x = self.transform(x)
                return np.asarray([float(prior(p)) for p in x])
            self.prior = safe_prior

        # ---------------------------------------------------- parallelism
        # Multi-process SPMD (jax.distributed) replaces MPI; in the common
        # single-process case this is rank 0 of 1.
        self.mpi_size = jax.process_count()
        self.mpi_rank = jax.process_index()
        self.use_mpi = self.mpi_size > 1
        self.single_or_primary_process = self.mpi_rank == 0

        args = {k: v for k, v in locals().items()
                if k not in ('self', 'loglike', 'transform', 'prior',
                             'trainer', 'base_dist')}
        args.update({'x_dim': x_dim, 'num_derived': num_derived,
                     'num_slow': num_slow, 'flow': flow,
                     'sampler': getattr(self, 'sampler', '')})

        # Rank-0-only run-dir ownership (reference sampler.py:177,182-190).
        # Strictly primary-gated: a timing-dependent "non-primary sees the
        # info/ dir" path once let a second process acquire logs and spawn
        # duplicate TensorBoard/model/plot writers on the shared dir
        # (caught by the 4-process lockstep test).
        if self.single_or_primary_process and log_dir is not None:
            self.logs = get_or_create_run_dir(
                log_dir, append_run_num=append_run_num)
            self.log_dir = self.logs['run_dir']
        else:
            self.logs = None
            self.log_dir = None

        self._init_args = args
        self.resume = resume
        self.logger = create_logger(__name__, level=log_level)

        if trainer is None:
            self.trainer = Trainer(
                x_dim,
                hidden_dim=hidden_dim,
                num_slow=num_slow,
                batch_size=batch_size,
                flow=flow,
                num_blocks=num_blocks,
                num_layers=num_layers,
                learning_rate=learning_rate,
                log_dir=self.log_dir,
                log=self.single_or_primary_process,
                use_gpu=use_gpu,
                base_dist=base_dist,
                scale=scale,
                seed=seed + 1,
                mesh=mesh)
        else:
            self.trainer = trainer

        if self.single_or_primary_process:
            self.logger.info('Num base params [%d]' % self.x_dim)
            self.logger.info('Num derived params [%d]' % self.num_derived)
            self.logger.info('Total params [%d]' % self.num_params)

        self.total_accepted = 0
        self.total_rejected = 0
        self.total_calls = 0
        self.total_fast_calls = 0

        # Per-phase wall-clock accounting (SURVEY.md §5.1: the reference has
        # only coarse run timers; we keep named phase timers).
        from nnest_tpu.utils.profiling import StepTimer
        self.timers = StepTimer()

        self._kernels = None
        self._max_log_det_j = None
        self._max_r = None
        self._last_kernel_stats = None
        # Per-generation start-decorrelation statistics (kernels'
        # 'mix_ratio' output) from every consumed mcmc/slice pool
        # generation this run; summarized into diagnostics.json. After a
        # resume the history covers the post-resume window only (it is a
        # kernel-health flag, not part of the evidence state).
        self._mix_ratios = []
        self._mix_ratios_eig = []   # eigenbasis variant (mix_ratio_eig)
        self._latent_conds = []     # start-population latent condition nos
        self._mix_rels = []         # r_eig / kernel-specific healthy null
        self._cond_rels = []        # latent_cond / healthy MP-floor null
        self._cond_infl = []        # structural inflation terms (Metropolis
                                    # generations only — see adjusted_logzerr)
        self._io_writer = None  # lazy serial background artifact writer

    # ------------------------------------------------------------- params

    def _save_params(self, extra=None):
        if self.logs is None:
            return
        d = dict(self._init_args)
        if extra:
            d.update(extra)
        d = {k: str(v) for k, v in d.items()}
        with open(os.path.join(self.logs['info'], 'params.txt'), 'w') as f:
            json.dump(d, f, indent=4)

    def _next_key(self):
        # jitted split: an *eager* jax.random.split is a per-call remote
        # dispatch on the TPU tunnel (~0.1-1 s each; profiled at ~0.8 s/call)
        self._key, sub = _split_key(self._key)
        return sub

    def _fetch_all(self, tree):
        """One batched async device→host pull for a pytree of kernel
        outputs. ``jax.device_get`` issues every leaf's copy_to_host_async
        before blocking, so the transfers overlap in flight — sequential
        ``np.asarray``/``int()``/``float()`` pulls cost one link round-trip
        *each* (profiled: 4.7k pulls = 58 s of a 156 s 10-D run). Leaves
        that are not fully addressable (multi-process global mesh) are
        resharded to replicated first — the all-gather rides the
        interconnect, the TPU-native replacement for the reference's MPI
        candidate gather (``nested.py:416-427``)."""
        def reshard(x):
            if hasattr(x, 'is_fully_addressable') and \
                    not x.is_fully_addressable:
                from nnest_tpu.parallel.mesh import replicated
                return jax.device_put(x, replicated(self.mesh))
            return x
        return jax.device_get(jax.tree.map(reshard, tree))

    def _submit_io(self, job):
        """Queue a file-IO closure on the serial background writer (state
        must already be snapshotted — the closure may run while the main
        thread mutates live arrays)."""
        if self._io_writer is None:
            from nnest_tpu.utils.io_async import SerialWriter
            self._io_writer = SerialWriter()
        self._io_writer.submit(job)

    def _drain_io(self):
        """Block until queued artifact writes hit disk (call before
        reading checkpoints back and before declaring a run complete);
        re-raises the first background write failure."""
        if self._io_writer is not None:
            self._io_writer.drain()

    def _close_io(self):
        """Drain and release the background writer thread (run end:
        seed-sweep processes build one sampler per run and would
        otherwise leak one idle daemon thread each). A later run() on
        this instance lazily recreates the writer."""
        if self._io_writer is not None:
            writer, self._io_writer = self._io_writer, None
            writer.close()

    def _join_plots(self):
        """Join any in-flight async diagnostic render before main-thread
        matplotlib work or before declaring run artifacts complete.
        Guarded so a user-injected ``trainer=`` object without
        ``finish_plots`` keeps working."""
        fp = getattr(self.trainer, 'finish_plots', None)
        if fp is not None:
            fp()

    # ------------------------------------------------------- jax closures

    def invalidate_kernels(self):
        """Call after changing self.transform (e.g. normalization in
        MCMCSampler.run) so jitted closures rebuild."""
        self._kernels = None

    def _build_kernels(self):
        x_dim, num_derived = self.x_dim, self.num_derived
        user_transform = self._user_transform
        user_loglike = self._user_loglike
        user_prior = self._user_prior
        transform_prior = self._transform_prior
        current_transform = self.transform

        # -- transform: pure JAX if traceable, else host callback.
        if user_transform is None and current_transform is self._transform_host:
            transform_jax = lambda u: u
        else:
            cand = (current_transform
                    if current_transform is not self._transform_host
                    else user_transform)
            if _is_jax_traceable(cand, (2, x_dim)):
                transform_jax = cand
            else:
                _tf = _host_batch_callback(
                    lambda a: (np.asarray(current_transform(
                        np.asarray(a)), dtype=np.float32),),
                    (((x_dim,), jnp.float32),), self.mesh)

                def transform_jax(u):
                    return _tf(u)[0]

        # -- likelihood: per-point logpdf vmapped, or traceable batch fn,
        #    or host callback.
        logpdf = getattr(user_loglike, 'logpdf', None)
        if callable(logpdf) and _is_jax_traceable(
                lambda v: jax.vmap(logpdf)(transform_jax(v)), (2, x_dim)):
            def like_fn(u):
                logl = jax.vmap(logpdf)(transform_jax(u))
                logl = jnp.where(jnp.isfinite(logl), logl, -1e32)
                return logl, jnp.zeros((u.shape[0], num_derived), jnp.float32)
        elif not callable(logpdf) and _is_jax_traceable(
                lambda v: user_loglike(transform_jax(v)), (2, x_dim)):
            def like_fn(u):
                res = user_loglike(transform_jax(u))
                # Traceable likelihoods may return (logl, derived) like the
                # reference's host API (sampler.py:120-133) — keep derived
                # computation on device instead of forcing the io_callback
                # path. The isinstance check is trace-time static.
                if isinstance(res, tuple):
                    logl, derived = res
                    derived = jnp.asarray(derived, jnp.float32)
                else:
                    logl = res
                    derived = jnp.zeros((u.shape[0], num_derived),
                                        jnp.float32)
                logl = jnp.where(jnp.isfinite(logl), logl, -1e32)
                return logl, derived
        else:
            def _host_call(a):
                a = np.asarray(a, dtype=np.float64)
                res = user_loglike(current_transform(a))
                if isinstance(res, tuple):
                    logl, derived = res
                else:
                    logl = res
                    derived = np.zeros((a.shape[0], num_derived))
                logl = np.asarray(logl, dtype=np.float64)
                logl[~np.isfinite(logl)] = -1e100
                return (logl.astype(np.float32),
                        np.asarray(derived, dtype=np.float32))

            like_fn = _host_batch_callback(
                _host_call,
                (((), jnp.float32), ((num_derived,), jnp.float32)),
                self.mesh)

        # -- prior logpdf in u-space.
        if user_prior is None:
            prior_fn = lambda u: jnp.zeros(u.shape[0], jnp.float32)
        else:
            p_logpdf = getattr(user_prior, 'logpdf', None)
            if callable(p_logpdf):
                if transform_prior:
                    def prior_fn(u):
                        return jax.vmap(p_logpdf)(transform_jax(u))
                else:
                    def prior_fn(u):
                        return jax.vmap(p_logpdf)(u)
            else:
                _pf = _host_batch_callback(
                    lambda a: (np.asarray(
                        self.prior(np.asarray(a)), dtype=np.float32),),
                    (((), jnp.float32),), self.mesh)

                def prior_fn(u):
                    return _pf(u)[0]

        self._kernels = LatentKernels(
            self.trainer.model, like_fn, prior_fn,
            num_slow=self.num_slow, oversample_rate=self.oversample_rate,
            num_derived=num_derived)
        # One-dispatch chain init: z = forward(x), x' = inverse(z) (the
        # numerical-consistency re-projection, reference sampler.py:262-289)
        # and the u-space log-prior, fused so initialization costs a single
        # device round-trip instead of four.
        model = self.trainer.model

        def _proj(params, x0):
            z, _ = model.forward(params, x0)
            x, _ = model.inverse(params, z)
            return z, x, prior_fn(x)

        self._init_project = jax.jit(_proj)
        return self._kernels

    @property
    def kernels(self) -> LatentKernels:
        if self._kernels is None:
            self._build_kernels()
        return self._kernels

    # --------------------------------------------------------------- MCMC

    def _mcmc_init(self, step_size, num_chains, init_samples, init_loglikes,
                   init_derived, max_start_tries):
        """Shared chain initialization (reference ``sampler.py:246-289``):
        project init points through forward∘inverse for numerical
        consistency, or draw latent starts from the base distribution until
        valid."""
        if step_size <= 0.0:
            step_size = 2.0 / self.x_dim ** 0.5
        self.trainer.ensure_init()
        params = self.trainer.params
        ncall_init = 0

        if init_samples is not None:
            num_chains = init_samples.shape[0]
            # One fused dispatch: z = forward(x), re-projected x = inverse(z)
            # (numerical consistency, reference sampler.py:262-289) and the
            # u-space log-prior — avoids fetching x to host just to compute
            # a jax-traceable prior (3 extra link round-trips per call).
            self.kernels  # ensure _init_project exists
            z, x, logl_prior = self._init_project(
                params, np.asarray(init_samples, dtype=np.float32))
            if init_loglikes is None or init_derived is None:
                logl, derived = self.loglike(np.asarray(x))
                ncall_init += num_chains
                logl = np.asarray(logl, dtype=np.float32)
                derived = np.asarray(derived, dtype=np.float32)
            else:
                logl = np.asarray(init_loglikes, dtype=np.float32)
                derived = np.asarray(
                    init_derived, dtype=np.float32).reshape(
                        num_chains, -1)[:, :self.num_derived]
        else:
            for i in range(max_start_tries):
                z = self.trainer.model.sample_base(self._next_key(),
                                                   num_chains)
                x, _ = self.trainer._inverse(params, z)
                logl, derived = self.loglike(np.asarray(x))
                ncall_init += num_chains
                logl_prior_np = self.prior(np.asarray(x))
                if np.all(logl > -1e30) and np.all(logl_prior_np > -1e30):
                    break
                if i == max_start_tries - 1:
                    raise RuntimeError('Could not find starting value')
            logl = jnp.asarray(logl, jnp.float32)
            derived = jnp.asarray(derived, jnp.float32)
            logl_prior = jnp.asarray(logl_prior_np, jnp.float32)

        if self.mesh is not None:
            from nnest_tpu.parallel.mesh import (batch_sharding,
                                                 params_sharding_tree)
            sh = batch_sharding(self.mesh)
            z = jax.device_put(z, sh)
            logl = jax.device_put(logl, sh)
            derived = jax.device_put(derived, sh)
            logl_prior = jax.device_put(logl_prior, sh)
            params = jax.device_put(
                params, params_sharding_tree(params, self.mesh))

        return params, z, logl, derived, logl_prior, step_size, ncall_init

    def _mcmc_sample_final(self,
                           mcmc_steps,
                           step_size=0.0,
                           dynamic_step_size=False,
                           init_samples=None,
                           init_loglikes=None,
                           init_derived=None,
                           loglstar=None,
                           max_start_tries=100,
                           prior_volume_steps=1,
                           stat_moments=None,
                           cov_from=None,
                           cov_mask=None):
        """Endpoint-only Metropolis: same trajectory as ``_mcmc_sample`` but
        transfers only each chain's final state + a moved flag — the part
        nested sampling consumes (reference ``nested.py:429-439``). Keeps
        the per-call device→host payload tiny (vital over a remote-TPU
        link). Chain statistics (ESS over ALL chains, window acceptance,
        mean jump — reference ``sampler.py:474-492``) are computed on device
        and exposed via ``self._last_kernel_stats``. ``cov_from`` (the f32
        live set) enables the covariance-preconditioned proposal, computed
        IN the kernel so the mesh route matches the fused route
        bit-for-bit.

        Returns (u, logl, derived, moved, scale, mean_jump, ncall)."""
        with self.timers.time('mcmc_init'):
            (params, z, logl, derived, logl_prior, step_size,
             ncall_init) = self._mcmc_init(
                step_size, init_samples.shape[0], init_samples,
                init_loglikes, init_derived, max_start_tries)

        with self.timers.time('mcmc_kernel'):
            out = self.kernels.mcmc(
                params, self._next_key(), z, logl, derived, logl_prior,
                loglstar=loglstar, step_size=step_size,
                mcmc_steps=mcmc_steps,
                dynamic_step_size=dynamic_step_size,
                prior_volume_steps=prior_volume_steps,
                collect_chains=False, stat_moments=stat_moments,
                cov_from=cov_from, cov_mask=cov_mask)
            jax.block_until_ready(out['final_x'])

        out = self._fetch_all(out)
        from nnest_tpu.utils.evaluation import (metropolis_mix_null,
                                                latent_cond_null)
        return self._consume_endpoint_out(
            out, ncall_extra=ncall_init,
            mix_null=metropolis_mix_null(mcmc_steps, self.x_dim,
                                         adapt_cov=cov_from is not None),
            cond_null=latent_cond_null(self.x_dim, init_samples.shape[0]),
            cond_inflates=True)

    def _consume_endpoint_out(self, out, ncall_extra=0, mix_null=None,
                              cond_null=None, cond_inflates=False):
        """Shared bookkeeping for endpoint-only kernel outputs (counter
        accumulation, diagnostic capture, float64 packing) — used by both
        the explicitly sharded `_mcmc_sample_final` route and the fused
        `_mcmc_sample_live` route so the two report identical stats.

        ``mix_null``: the kernel's expected healthy eigenbasis mixing
        ratio for this generation's step budget (see
        ``metropolis_mix_null`` / ``slice_mix_null``). When given and the
        kernel emitted ``mix_ratio_eig``, the RELATIVE ratio
        r_eig/mix_null is recorded — the kinetic term of the calibrated
        logzerr adjustment (BENCHMARKS.md round 4). ``cond_null``: the
        healthy-run latent condition number for this generation's chain
        count (``latent_cond_null``); the relative ratio is the
        structural-anisotropy diagnostic. ``cond_inflates``: True for
        Metropolis generations, whose structural ratio additionally
        feeds the adjusted-error inflation — measured (BENCHMARKS.md
        round 5): the random-walk kernel's excess banana scatter tracks
        cond_rel (needed 3.2-6.4x where the kinetic term reads
        1.5-2.2x) while the slice kernel's kinetic term alone already
        calibrates on the same geometry (round-4 slice@100/@400 both in
        band), so slice generations record the diagnostic without
        inflating the bar."""
        self.total_calls += int(out['ncall'])
        self.total_fast_calls += int(out['fast_calls'])
        self.total_accepted += int(out['accepted'])
        self.total_rejected += int(out['rejected'])
        self._last_diag_chains = np.asarray(out['diag_chains'],
                                            dtype=np.float64)
        # 'mix_ratio' may be absent from pool buffers restored out of a
        # pre-round-4 exact_state.pkl — the diagnostic then just skips
        # those generations.
        mix = out.get('mix_ratio')
        if mix is not None:
            mix = float(mix)
            self._mix_ratios.append(mix)
        # Eigenbasis mixing + latent condition number: the kernel emits
        # only the two d x d second-moment matrices (an in-program eigh
        # measured ~70 ms/generation on v5e); the f64 eigh runs here.
        mix_eig = latent_cond = None
        if out.get('mix_cov') is not None:
            from nnest_tpu.utils.evaluation import eig_mix_from_moments
            mix_eig, latent_cond = eig_mix_from_moments(
                out['mix_cov'], out['mix_msd'])
            self._mix_ratios_eig.append(mix_eig)
            self._latent_conds.append(latent_cond)
            if mix_null is not None:
                self._mix_rels.append(mix_eig / max(mix_null, 1e-6))
            if cond_null is not None:
                self._cond_rels.append(latent_cond / max(cond_null, 1e-6))
                if cond_inflates:
                    self._cond_infl.append(self._cond_rels[-1])
        self._last_kernel_stats = {
            'ess': np.asarray(out['ess'], dtype=np.float64),
            'acceptance': float(out['acceptance']),
            'mean_jump': float(out['mean_jump']),
            'mix_ratio': mix,
            'mix_ratio_eig': mix_eig,
            'latent_cond': latent_cond,
        }
        return (np.asarray(out['final_x'], dtype=np.float64),
                np.asarray(out['final_logl'], dtype=np.float64),
                np.asarray(out['final_derived'], dtype=np.float64),
                np.asarray(out['moved']),
                float(out['scale']),
                float(out['mean_jump']),
                int(out['ncall']) + ncall_extra)

    def _mcmc_sample_live(self,
                          mcmc_steps,
                          active_u,
                          active_logl,
                          active_derived,
                          num_chains,
                          loglstar,
                          step_size,
                          dynamic_step_size=False,
                          prior_volume_steps=1,
                          adapt_cov=False):
        """Fused single-dispatch variant of ``_mcmc_sample_final`` for the
        nested sampler's pool generations: chain-start selection from the
        live set + numerical re-projection + the chain scan are one device
        program (``LatentKernels.mcmc_from_live``). Bit-identical chain
        trajectories to the unfused path (same key roles, exact one-hot
        selection); used on the single-device path — mesh runs keep the
        explicitly sharded ``_mcmc_sample_final`` route.

        Returns (u, logl, derived, moved, scale, mean_jump, ncall)."""
        key_idx, key_chain = self._next_key(), self._next_key()
        if step_size <= 0.0:
            step_size = 2.0 / self.x_dim ** 0.5
        self.trainer.ensure_init()
        with self.timers.time('mcmc_kernel'):
            out = self.kernels.mcmc_from_live(
                self.trainer.params, key_idx, key_chain,
                active_u, active_logl, active_derived,
                num_chains=num_chains, loglstar=loglstar,
                step_size=step_size, mcmc_steps=mcmc_steps,
                dynamic_step_size=dynamic_step_size,
                prior_volume_steps=prior_volume_steps,
                adapt_cov=adapt_cov)
            out = self._fetch_all(out)
        from nnest_tpu.utils.evaluation import (metropolis_mix_null,
                                                latent_cond_null)
        return self._consume_endpoint_out(
            out, mix_null=metropolis_mix_null(mcmc_steps, self.x_dim,
                                              adapt_cov=adapt_cov),
            cond_null=latent_cond_null(self.x_dim, num_chains),
            cond_inflates=True)

    def _mcmc_generations_batch(self,
                                mcmc_steps,
                                active_u,
                                active_logl,
                                active_derived,
                                num_chains,
                                step_size,
                                it,
                                update_interval,
                                max_iters,
                                max_gens,
                                dynamic_step_size=False,
                                speculate=False,
                                adapt_cov=False):
        """Prefetch up to ``max_gens`` MCMC pool generations in one
        dispatch + ONE batched pull (``LatentKernels.mcmc_pool_generations``
        — on-device pool consumption evolves the live set between
        generations, bit-identical to dispatching them one at a time; see
        the kernel docstring for the exactness argument). Consumes the
        sampler key on device: two splits per generation in ``_next_key``
        order, so the carried key is replaced by the kernel's advanced key.

        Returns a list of (endpoint_out_dict, start_loglstar, start_it)
        tuples, one per generation actually run — the caller feeds each
        through ``_consume_endpoint_out`` at the moment the host replay
        reaches it, keeping counter/ncall accounting identical to the
        unfused route (generations never consumed are discarded and never
        counted)."""
        if step_size <= 0.0:
            step_size = 2.0 / self.x_dim ** 0.5
        self.trainer.ensure_init()
        key = self._key
        with self.timers.time('mcmc_kernel'):
            bufs, meta, n_gens, key_out = self.kernels.mcmc_pool_generations(
                self.trainer.params, key, active_u, active_logl,
                active_derived, it, step_size, update_interval, max_iters,
                num_chains=num_chains, mcmc_steps=mcmc_steps,
                max_gens=max_gens, dynamic_step_size=dynamic_step_size,
                speculate=speculate, adapt_cov=adapt_cov)
            self._key = key_out
            bufs, meta, n_gens = self._fetch_all((bufs, meta, n_gens))
        return self._gens_to_buffer(bufs, meta, n_gens)

    def _slice_sample_live(self,
                           slice_steps,
                           active_u,
                           active_logl,
                           active_derived,
                           num_chains,
                           loglstar,
                           width,
                           max_expand=4,
                           max_shrink=10,
                           adapt_cov=False):
        """Fused single-dispatch slice-sampling pool generation from the
        live set (``LatentKernels.slice_from_live``) — the slice analogue
        of ``_mcmc_sample_live`` (same key roles and endpoint bookkeeping).

        Returns (u, logl, derived, moved, scale, mean_jump, ncall)."""
        key_idx, key_chain = self._next_key(), self._next_key()
        self.trainer.ensure_init()
        with self.timers.time('mcmc_kernel'):
            out = self.kernels.slice_from_live(
                self.trainer.params, key_idx, key_chain,
                active_u, active_logl, active_derived,
                num_chains=num_chains, loglstar=loglstar, width=width,
                slice_steps=slice_steps, max_expand=max_expand,
                max_shrink=max_shrink, adapt_cov=adapt_cov)
            out = self._fetch_all(out)
        from nnest_tpu.utils.evaluation import (slice_mix_null,
                                                latent_cond_null)
        return self._consume_endpoint_out(
            out, mix_null=slice_mix_null(slice_steps, self.x_dim),
            cond_null=latent_cond_null(self.x_dim, num_chains))

    def _slice_sample_final(self,
                            slice_steps,
                            width,
                            init_samples=None,
                            init_loglikes=None,
                            init_derived=None,
                            loglstar=None,
                            max_start_tries=100,
                            max_expand=4,
                            max_shrink=10,
                            stat_moments=None,
                            cov_from=None,
                            cov_mask=None):
        """Endpoint-only slice sampling from explicit start points — the
        slice analogue of ``_mcmc_sample_final`` (used on the mesh route,
        where chain batches are explicitly dp-sharded by ``_mcmc_init``).
        ``cov_from`` (the f32 live set) enables covariance-adapted
        directions, computed IN the kernel so the mesh route matches the
        fused route bit-for-bit.

        Returns (u, logl, derived, moved, scale, mean_jump, ncall)."""
        with self.timers.time('mcmc_init'):
            (params, z, logl, derived, _logl_prior, _ss,
             ncall_init) = self._mcmc_init(
                width, init_samples.shape[0], init_samples,
                init_loglikes, init_derived, max_start_tries)
        with self.timers.time('mcmc_kernel'):
            out = self.kernels.slice_(
                params, self._next_key(), z, logl, derived,
                loglstar=loglstar, width=width, slice_steps=slice_steps,
                max_expand=max_expand, max_shrink=max_shrink,
                stat_moments=stat_moments, cov_from=cov_from,
                cov_mask=cov_mask)
            jax.block_until_ready(out['final_x'])
        out = self._fetch_all(out)
        from nnest_tpu.utils.evaluation import (slice_mix_null,
                                                latent_cond_null)
        return self._consume_endpoint_out(
            out, ncall_extra=ncall_init,
            mix_null=slice_mix_null(slice_steps, self.x_dim),
            cond_null=latent_cond_null(self.x_dim, init_samples.shape[0]))

    def _slice_generations_batch(self,
                                 slice_steps,
                                 active_u,
                                 active_logl,
                                 active_derived,
                                 num_chains,
                                 width,
                                 it,
                                 update_interval,
                                 max_iters,
                                 max_gens,
                                 max_expand=4,
                                 max_shrink=10,
                                 speculate=False,
                                 adapt_cov=False):
        """Prefetch up to ``max_gens`` slice pool generations in one
        dispatch — the slice analogue of ``_mcmc_generations_batch`` (same
        on-device pool consumption, key discipline and exactness gate)."""
        self.trainer.ensure_init()
        key = self._key
        with self.timers.time('mcmc_kernel'):
            bufs, meta, n_gens, key_out = \
                self.kernels.slice_pool_generations(
                    self.trainer.params, key, active_u, active_logl,
                    active_derived, it, width, update_interval, max_iters,
                    num_chains=num_chains, slice_steps=slice_steps,
                    max_gens=max_gens, max_expand=max_expand,
                    max_shrink=max_shrink, speculate=speculate,
                    adapt_cov=adapt_cov)
            self._key = key_out
            bufs, meta, n_gens = self._fetch_all((bufs, meta, n_gens))
        return self._gens_to_buffer(bufs, meta, n_gens)

    def _gens_to_buffer(self, bufs, meta, n_gens):
        """Unstack fetched pool generations into buffer entries
        ``(out, start_loglstar, start_it, key_before)``; ``key_before`` is
        None unless the kernel ran speculatively (then it is the PRNG key
        to rewind to if this generation must be discarded after a lost
        retrain speculation)."""
        kb = meta.get('key_before')
        gens = []
        for g in range(int(n_gens)):
            gens.append(({k: v[g] for k, v in bufs.items()},
                         float(meta['start_loglstar'][g]),
                         int(meta['start_it'][g]),
                         None if kb is None else np.array(kb[g])))
        return gens

    def _rewind_key(self, key_data):
        """Restore the sampler PRNG key from recorded key data, keeping
        the current key flavor (legacy uint32 vs typed) so jitted kernels
        do not retrace on dtype change."""
        if jnp.issubdtype(jnp.asarray(self._key).dtype,
                          jax.dtypes.prng_key):
            self._key = jax.random.wrap_key_data(jnp.asarray(key_data))
        else:
            self._key = jnp.asarray(key_data,
                                    jnp.asarray(self._key).dtype)

    def _mcmc_sample(self,
                     mcmc_steps,
                     step_size=0.0,
                     dynamic_step_size=False,
                     num_chains=1,
                     init_samples=None,
                     init_loglikes=None,
                     init_derived=None,
                     loglstar=None,
                     max_start_tries=100,
                     output_interval=None,
                     stats_interval=None,
                     plot_trace=False,
                     prior_volume_steps=1,
                     show_progress=False):
        """Host-facing Metropolis entry (reference ``sampler.py:229-463``):
        same returns (samples, latent, derived, loglikes, scale, ncall) with
        chains shaped (num_chains, mcmc_steps+1, dim) — but the whole
        trajectory is one compiled program."""
        del show_progress  # single device dispatch; nothing to page through
        (params, z, logl, derived, logl_prior, step_size,
         ncall_init) = self._mcmc_init(
            step_size, num_chains, init_samples, init_loglikes,
            init_derived, max_start_tries)

        out = self.kernels.mcmc(
            params, self._next_key(), z, logl, derived,
            logl_prior, loglstar=loglstar, step_size=step_size,
            mcmc_steps=mcmc_steps,
            dynamic_step_size=dynamic_step_size,
            prior_volume_steps=prior_volume_steps)

        out = self._fetch_all(out)
        samples = np.asarray(out['samples'], dtype=np.float64)
        latent = np.asarray(out['latent'], dtype=np.float64)
        derived_s = np.asarray(out['derived'], dtype=np.float64)
        loglikes = np.asarray(out['loglikes'], dtype=np.float64)
        scale_out = float(out['scale'])
        ncall = int(out['ncall']) + ncall_init

        self.total_calls += int(out['ncall'])
        self.total_fast_calls += int(out['fast_calls'])
        self.total_accepted += int(out['accepted'])
        self.total_rejected += int(out['rejected'])

        if output_interval is not None and self.logs is not None:
            self._save_samples(self.transform(
                samples.reshape(-1, self.x_dim)).reshape(samples.shape),
                loglikes)
        if stats_interval is not None and mcmc_steps >= stats_interval:
            self._chain_stats(self.transform(
                samples.reshape(-1, self.x_dim)).reshape(samples.shape))
        if plot_trace:
            self._plot_trace(samples, latent)

        return samples, latent, derived_s, loglikes, scale_out, ncall

    # ---------------------------------------------------------- rejection

    def _rejection_prior_sample(self, loglstar, num_trials=None,
                                prior=None):
        """Batched prior rejection (reference ``sampler.py:529-543``).
        Returns (samples, loglikes, derived, effective_ncall) where samples
        contains the *successful* trials (may be empty)."""
        prior = prior if prior is not None else self._user_prior
        trials = int(num_trials) if num_trials else 512
        x, logl, derived, ok = self._fetch_all(self.kernels.rejection_prior(
            prior, self._next_key(), loglstar, trials))
        ok = np.asarray(ok)
        self.total_calls += trials
        n_ok = int(ok.sum())
        nc = trials / max(n_ok, 1) if n_ok > 0 else trials
        return (np.asarray(x)[ok], np.asarray(logl, dtype=np.float64)[ok],
                np.asarray(derived, dtype=np.float64)[ok], nc)

    def _rejection_prior_generations_batch(self, active_u, active_logl,
                                           active_derived, it, max_iters,
                                           it_stop, ncs, expiry_thr,
                                           trials_target, num_trials,
                                           max_gens, adapt_trials,
                                           can_double, can_halve,
                                           prior=None):
        """Prefetch up to ``max_gens`` prior-rejection pool generations in
        one dispatch + ONE batched pull
        (``LatentKernels.rejection_prior_generations``). Consumes the
        sampler key on device (one split per generation in ``_next_key``
        order). ``ncs`` is the host's f64 mean-calls window; its last 20
        entries are mirrored to the device ring keyed on absolute push
        index. Returns a list of
        (x, logl, derived, ok, start_loglstar, start_it) per generation
        actually run."""
        prior = prior if prior is not None else self._user_prior
        window_vals = np.zeros(20, np.float32)
        count = len(ncs)
        for idx in range(max(0, count - 20), count):
            window_vals[idx % 20] = np.float32(ncs[idx])
        key = self._key
        with self.timers.time('candidate_kernel'):
            bufs, meta, n_gens, key_out = \
                self.kernels.rejection_prior_generations(
                    prior, key, active_u, active_logl, active_derived,
                    it, max_iters, it_stop, window_vals, count,
                    expiry_thr, trials_target, num_trials=num_trials,
                    max_gens=max_gens, adapt_trials=adapt_trials,
                    can_double=can_double, can_halve=can_halve)
            self._key = key_out
            bufs, meta, n_gens = self._fetch_all((bufs, meta, n_gens))
        gens = []
        for g in range(int(n_gens)):
            gens.append((bufs['x'][g], bufs['logl'][g],
                         bufs['derived'][g], bufs['ok'][g],
                         float(meta['start_loglstar'][g]),
                         int(meta['start_it'][g])))
        return gens

    def _rejection_flow_generations_batch(self, active_u, active_logl,
                                          active_derived, it, max_iters,
                                          update_interval, ncs,
                                          expiry_thr, trials_target,
                                          env_valid, env_gens,
                                          max_log_det_j, max_r,
                                          cache_interval,
                                          enlargement_factor,
                                          draw_enlargement, num_trials,
                                          max_gens, adapt_trials,
                                          can_double, can_halve):
        """Flow-phase analogue of ``_rejection_prior_generations_batch``
        (see there): one dispatch + one batched pull for up to
        ``max_gens`` flow-rejection generations, with the Jacobian
        envelope cache carried on device. Returns a list of
        (x, logl, derived, ok, n_evals, mld, mr, start_loglstar,
        start_it) per generation actually run."""
        self.trainer.ensure_init()
        window_vals = np.zeros(20, np.float32)
        count = len(ncs)
        for idx in range(max(0, count - 20), count):
            window_vals[idx % 20] = np.float32(ncs[idx])
        key = self._key
        with self.timers.time('candidate_kernel'):
            bufs, meta, n_gens, key_out = \
                self.kernels.rejection_flow_generations(
                    self.trainer.params, key, active_u, active_logl,
                    active_derived, it, max_iters, update_interval,
                    window_vals, count, expiry_thr, trials_target,
                    env_valid, env_gens, max_log_det_j, max_r,
                    cache_interval, enlargement_factor, draw_enlargement,
                    num_trials=num_trials, max_gens=max_gens,
                    adapt_trials=adapt_trials, can_double=can_double,
                    can_halve=can_halve)
            self._key = key_out
            bufs, meta, n_gens = self._fetch_all((bufs, meta, n_gens))
        gens = []
        for g in range(int(n_gens)):
            gens.append((bufs['x'][g], bufs['logl'][g],
                         bufs['derived'][g], bufs['ok'][g],
                         int(bufs['n_evals'][g]), float(bufs['mld'][g]),
                         float(bufs['mr'][g]),
                         float(meta['start_loglstar'][g]),
                         int(meta['start_it'][g])))
        return gens

    def _rejection_flow_sample(self,
                               init_samples,
                               loglstar,
                               enlargement_factor=1.1,
                               constant_efficiency_factor=None,
                               cache=False,
                               num_trials=512):
        """Batched flow rejection sampling (reference
        ``sampler.py:545-607``)."""
        self.trainer.ensure_init()
        params = self.trainer.params
        # The envelope runs on EVERY pool generation: with ``cache`` the
        # fresh live-set values are folded into the cached maxima (live
        # points migrate between full recomputes — under a fixed flow the
        # envelope must cover every live point seen, and max-folding is
        # exact); without ``cache`` (periodic recompute / post-retrain
        # invalidation) the cache is replaced outright, which lets the
        # envelope shrink as dead points leave the live set. Reference
        # recomputes on a fixed iteration modulo (sampler.py:555-560).
        draw_enlargement = enlargement_factor
        if constant_efficiency_factor is not None:
            draw_enlargement = (
                1.0 / constant_efficiency_factor) ** (1.0 / self.x_dim)
        if self.mesh is None:
            # Fused single-dispatch path: envelope recompute + max-fold +
            # rejection draw in one program (bit-identical — float max is
            # exact and the key role matches; the two-dispatch route costs
            # a full extra link round-trip per pool generation).
            fold = bool(cache and self._max_log_det_j is not None)
            x, logl, derived, ok, n_evals, mld, mr = self._fetch_all(
                self.kernels.rejection_flow_live(
                    params, self._next_key(), loglstar, init_samples,
                    self._max_log_det_j if fold else 0.0,
                    self._max_r if fold else 0.0, fold,
                    enlargement_factor, draw_enlargement,
                    int(num_trials)))
            self._max_log_det_j = float(mld)
            self._max_r = float(mr)
        else:
            # mesh runs keep the explicit two-dispatch route
            mld, mr = self._fetch_all(self.kernels.envelope(
                params, init_samples, enlargement_factor))
            if cache and self._max_log_det_j is not None:
                self._max_log_det_j = max(self._max_log_det_j, float(mld))
                self._max_r = max(self._max_r, float(mr))
            else:
                self._max_log_det_j = float(mld)
                self._max_r = float(mr)
            x, logl, derived, ok, n_evals = self._fetch_all(
                self.kernels.rejection_flow(
                    params, self._next_key(), loglstar,
                    self._max_log_det_j, self._max_r, draw_enlargement,
                    int(num_trials)))
        ok = np.asarray(ok)
        self.total_calls += int(n_evals)
        n_ok = int(ok.sum())
        nc = int(n_evals) / max(n_ok, 1) if n_ok > 0 else max(int(n_evals), 1)
        return (np.asarray(x)[ok], np.asarray(logl, dtype=np.float64)[ok],
                np.asarray(derived, dtype=np.float64)[ok], nc)

    def _density_sample(self, loglstar, num_trials=512):
        """Batched flow-density sampling (reference ``sampler.py:609-630``)."""
        self.trainer.ensure_init()
        x, logl, derived, ok, n_evals = self._fetch_all(self.kernels.density(
            self.trainer.params, self._next_key(), loglstar,
            int(num_trials)))
        ok = np.asarray(ok)
        self.total_calls += int(n_evals)
        n_ok = int(ok.sum())
        nc = int(n_evals) / max(n_ok, 1) if n_ok > 0 else max(int(n_evals), 1)
        return (np.asarray(x)[ok], np.asarray(logl, dtype=np.float64)[ok],
                np.asarray(derived, dtype=np.float64)[ok], nc)

    # ------------------------------------------------------------ ensemble

    def _ensemble_sample(self,
                         mcmc_steps,
                         num_walkers,
                         init_samples=None,
                         init_loglikes=None,
                         init_derived=None,
                         loglstar=None,
                         max_start_tries=100,
                         output_interval=None,
                         stats_interval=None,
                         plot_trace=False,
                         moves=None,
                         show_progress=False):
        """Latent-space ensemble sampling with native moves (stretch / de /
        snooker / kde; the reference delegates to emcee,
        ``sampler.py:632-724``). ``moves`` may be a dict {name: weight}
        (the reference's format, ``ensemble.py:120-134``) or a tuple of
        (name, weight); default is the pure stretch move."""
        del show_progress
        if moves is None:
            moves = (('stretch', 1.0),)
        elif isinstance(moves, dict):
            moves = tuple(moves.items())
        else:
            moves = tuple(moves)
        self.trainer.ensure_init()
        params = self.trainer.params

        if init_samples is not None:
            num_walkers = init_samples.shape[0]
            z, _ = self.trainer._forward(
                params, jnp.asarray(init_samples, jnp.float32))
        else:
            for i in range(max_start_tries):
                z = self.trainer.model.sample_base(self._next_key(),
                                                   num_walkers)
                x, _ = self.trainer._inverse(params, z)
                if np.all(self.prior(np.asarray(x)) > -1e30):
                    break
                if i == max_start_tries - 1:
                    raise RuntimeError('Could not find starting value')

        out = self._fetch_all(self.kernels.stretch(
            params, self._next_key(), z, mcmc_steps=mcmc_steps,
            loglstar=loglstar, moves=moves))
        samples = np.asarray(out['samples'], dtype=np.float64)
        latent = np.asarray(out['latent'], dtype=np.float64)
        derived = np.asarray(out['derived'], dtype=np.float64)
        loglikes = np.asarray(out['loglikes'], dtype=np.float64)
        ncall = int(out['ncall'])
        self.total_calls += ncall
        self.total_accepted += int(out['accepted'])
        self.total_rejected += int(out['rejected'])

        if stats_interval is not None and mcmc_steps >= stats_interval:
            self._chain_stats(self.transform(
                samples.reshape(-1, self.x_dim)).reshape(samples.shape))
        if plot_trace:
            self._plot_trace(samples, latent)

        return samples, latent, derived, loglikes, ncall

    # ------------------------------------------------------------- stats/io

    def _chain_stats(self, samples, mean=None, std=None, step=None):
        """(reference ``sampler.py:474-492``)"""
        acceptance = acceptance_rate(samples)
        if mean is None:
            mean = np.mean(samples.reshape(-1, samples.shape[2]), axis=0)
        if std is None:
            std = np.std(samples.reshape(-1, samples.shape[2]), axis=0)
        ess = effective_sample_size(samples, mean, std ** 2)
        jump = mean_jump_distance(samples)
        if samples.shape[0] > 1:
            gelman_rubin_diagnostic(samples)
        prefix = '' if step is None else 'Step [%d] ' % step
        self.logger.info(
            '%sAcceptance [%5.4f] min ESS [%5.4f] max ESS [%5.4f] average '
            'jump [%5.4f]' % (prefix, acceptance, np.min(ess), np.max(ess),
                              jump))
        return acceptance, ess, jump

    def _save_samples(self, samples, loglikes, weights=None,
                      derived_samples=None, min_weight=1e-30,
                      outfile='chain'):
        """getdist/CosmoMC text chains (reference ``sampler.py:494-527``):
        rows of `weight -loglike params [derived]`."""
        if self.logs is None:
            return
        if weights is None:
            weights = np.ones_like(loglikes)

        def write_one(path, s, ll, w, d):
            header = ''
            if self.param_names is not None:
                header = 'weight minusloglike ' + ' '.join(self.param_names)
            if _runtime.write_chain(path, w, ll, s, derived=d,
                                    min_weight=min_weight, header=header):
                return
            cols = [np.maximum(w, min_weight)[:, None], -ll[:, None], s]
            if d is not None:
                cols.append(d)
            mat = np.hstack(cols)
            np.savetxt(path, mat, fmt='%.5E', header=header,
                       comments='#' if header else '')

        if samples.ndim == 2:
            write_one(os.path.join(self.logs['chains'], outfile + '.txt'),
                      samples, loglikes, weights, derived_samples)
        else:
            for ib in range(samples.shape[0]):
                write_one(
                    os.path.join(self.logs['chains'],
                                 outfile + '_%s.txt' % (ib + 1)),
                    samples[ib], loglikes[ib], weights[ib],
                    None if derived_samples is None else derived_samples[ib])

    def _plot_trace(self, samples, latent_samples):
        """(reference ``sampler.py:465-472``)"""
        if self.log_dir is None:
            return
        # matplotlib is not thread-safe: never draw on the main thread
        # while an async triptych render is in flight
        self._join_plots()
        try:
            import matplotlib
            matplotlib.use('Agg')
            import matplotlib.pyplot as plt
        except ImportError:
            return
        fig, ax = plt.subplots(self.x_dim, 2,
                               figsize=(10, max(self.x_dim, 2)), sharex=True)
        ax = np.atleast_2d(ax)
        for i in range(self.x_dim):
            ax[i, 0].plot(samples[0, :, i])
            ax[i, 1].plot(latent_samples[0, :1000, i])
        plt.savefig(os.path.join(self.log_dir, 'plots', 'trace.png'))
        plt.close(fig)
