"""Flow trainer — maximum-likelihood training of a normalizing flow.

TPU-native equivalent of the reference Trainer (``nnest/trainer.py:28-418``)
with the same public surface: constructor flow selection
(``trainer.py:83-100``), ``train()`` with validation split / jitter /
patience / best-model restore (``trainer.py:134-245``), numpy-facing
``forward``/``inverse``/``get_*``/``log_probs`` bridges
(``trainer.py:247-301``), ``plot_samples`` (``trainer.py:303-371``) and model
checkpointing. Architectural differences (TPU-first):

- One jitted *training* program: a lax.while_loop over epochs (each a
  shuffle + scan over train batches + validation loss) carrying the
  best-validation params and the patience counter, so a whole early-stopped
  ``train()`` is a single device dispatch. The reference dispatches
  per-batch torch ops from Python.
- Optimizer is optax Adam with torch-style L2 weight decay (decay added to
  the gradient *before* the Adam moments, matching ``torch.optim.Adam
  (weight_decay=…)`` used at ``trainer.py:121-122``), masked so frozen
  buffers (param keys starting with '_', e.g. the 1x1-conv permutation) are
  never updated.
- Auto-jitter (kNN mean distance, reference ``trainer.py:168-173``) is a
  jitted pairwise-distance computation instead of scipy cKDTree.
- Explicit PRNG threading: a seed produces a reproducible run; the reference
  uses the unseeded global RNG.
"""

from __future__ import annotations

import logging
import os
import pickle
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nnest_tpu.flows import build_flow
from nnest_tpu.utils.logger import create_logger

from nnest_tpu.utils.rng import split_key as _split_key

_perm = jax.jit(lambda k, n: jax.random.permutation(k, n),
                static_argnums=1)

# Process-wide cache of jitted flow/training programs. Every jitted program
# here is a pure function of the flow CONFIG (architecture kwargs), the
# optimizer hyperparameters and the data shapes — never of a particular
# Trainer instance — so fresh Trainer instances with an identical config
# (seed-sweep runners, the analyse protocol, the test suite, one sampler
# per process restarts) reuse the already-traced callables instead of
# paying a re-trace plus a compile-cache load per instance (measured
# 7–10 s per seed for the 2-D training program over the remote-TPU link vs
# ~1 s for the warm call; the reference re-builds its torch modules per
# instance too, but its per-batch host loop has no trace cost to amortize).
_SHARED_JIT_CACHE = {}


def _shared_jit(config_key, name, build):
    """Return (and memoize) a jitted callable for ``(config_key, name)``.

    ``config_key=None`` disables sharing (unhashable config, e.g. a
    user-supplied base-distribution object) and falls back to a fresh
    per-instance callable."""
    if config_key is None:
        return build()
    key = (config_key, name)
    fn = _SHARED_JIT_CACHE.get(key)
    if fn is None:
        fn = build()
        _SHARED_JIT_CACHE[key] = fn
    return fn


def trainable_mask(params):
    """Pytree bool mask: False for frozen buffer leaves (dict keys starting
    with '_'), True otherwise."""

    def mark(path, leaf):
        for p in path:
            name = getattr(p, 'key', None)
            if isinstance(name, str) and name.startswith('_'):
                return False
        return True

    return jax.tree_util.tree_map_with_path(mark, params)


@jax.jit
def _mean_nn_distance(x):
    """Mean distance to nearest neighbour (auto-jitter scale). MXU-friendly
    O(n²) pairwise distances; fine for live-point-sized sets. Jitted: run
    eagerly this is ~8 remote dispatches per flow retrain on the tunnel."""
    sq = jnp.sum(x ** 2, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * jnp.dot(
        x, x.T, precision=jax.lax.Precision.HIGHEST)
    # finite self-distance sentinel (TPU rule: keep inf out of kernels)
    d2 = d2 + jnp.diag(jnp.full(x.shape[0], 1e30))
    return jnp.mean(jnp.sqrt(jnp.maximum(jnp.min(d2, axis=1), 0.0)))


class Trainer:
    best_validation_epoch = None
    best_validation_loss = None

    def __init__(self,
                 x_dim,
                 hidden_dim=16,
                 num_slow=0,
                 batch_size=100,
                 flow='spline',
                 scale='',
                 num_blocks=3,
                 num_layers=1,
                 base_dist=None,
                 load_model='',
                 log_dir='logs/test',
                 use_gpu=False,
                 log=True,
                 learning_rate=0.0001,
                 weight_decay=1e-6,
                 log_level=logging.INFO,
                 seed=0,
                 num_bins=8,
                 tail_bound=3.0,
                 epoch_chunk=25,
                 mesh=None):
        # use_gpu is accepted for API compatibility; device placement in JAX
        # follows the platform (TPU when available) automatically.
        del use_gpu

        # Persistent XLA executable cache: a fresh Trainer's jitted programs
        # otherwise recompile per instance/process (~25 s in-process, the
        # full remote-compile bill cross-process). Idempotent, respects
        # user config, opt-out NNEST_TPU_NO_CACHE=1.
        from nnest_tpu.utils.compilation_cache import enable_compilation_cache
        enable_compilation_cache()

        self.x_dim = x_dim
        self.z_dim = x_dim
        self.batch_size = batch_size
        # epoch_chunk is retained for API compatibility; since the whole
        # early-stopped training became one while_loop dispatch it no
        # longer affects execution.
        self.epoch_chunk = max(1, int(epoch_chunk))
        # Optional jax.sharding.Mesh: training/validation batches are
        # dp-sharded so the NLL epoch scans run data-parallel across devices
        # (grads reduced by XLA collectives).
        self.mesh = mesh
        self.total_iters = 0
        assert x_dim > num_slow
        self.num_slow = num_slow

        self.model = build_flow(
            x_dim, flow=flow, hidden_dim=hidden_dim, num_slow=num_slow,
            num_blocks=num_blocks, num_layers=num_layers, scale=scale,
            base_dist=base_dist, num_bins=num_bins, tail_bound=tail_bound)

        # The model is a frozen dataclass with pure methods, deterministic in
        # the architecture kwargs, so with the default base_dist the jitted
        # programs below are interchangeable between same-config instances.
        if base_dist is None:
            self._config_key = (x_dim, flow, hidden_dim, num_slow,
                                num_blocks, num_layers, scale, num_bins,
                                float(tail_bound), float(learning_rate),
                                float(weight_decay))
        else:
            self._config_key = None

        self._key = jax.random.PRNGKey(seed)
        self.params = None  # data-dependent init at first train()/use
        self._host_params_src = None   # identity key for host_params()
        self._host_params_cache = None

        self.learning_rate = learning_rate
        self.weight_decay = weight_decay
        self._opt = None
        self._opt_state = None

        self.logger = create_logger(__name__, level=log_level)
        self.log = log
        self.writer = None
        # SummaryWriter is not documented thread-safe; the async triptych
        # render thread calls add_figure while the main thread may be
        # writing scalars — serialize all writer access through this lock.
        self._writer_lock = threading.Lock()

        if load_model:
            self.path = os.path.join(log_dir, load_model)
            self.load(os.path.join(self.path, 'models', 'netG.pkl'))
        elif log_dir is not None:
            self.path = log_dir
            for sub in ('models', 'data', 'chains', 'plots'):
                os.makedirs(os.path.join(self.path, sub), exist_ok=True)
        else:
            self.path = None

        if self.path is not None:
            self.writer = _make_writer(self.path)

        # jit caches (per input shape, handled by jax); shared across
        # same-config instances so seed sweeps don't re-trace per seed
        ck = self._config_key
        self._forward = _shared_jit(
            ck, 'forward', lambda: jax.jit(self.model.forward))
        self._inverse = _shared_jit(
            ck, 'inverse', lambda: jax.jit(self.model.inverse))
        self._log_prob = _shared_jit(
            ck, 'log_prob', lambda: jax.jit(self.model.log_prob))
        self._sample = _shared_jit(
            ck, 'sample',
            lambda: jax.jit(self.model.sample, static_argnames=('num',)))
        self._epoch_cache = {}

        self.logger.info('Flow [%s] x_dim [%d] num_slow [%d]' %
                         (flow, x_dim, num_slow))

    # ------------------------------------------------------------------ rng

    def log_scalar(self, tag, value, step):
        """Thread-safe TensorBoard scalar write (samplers log through this
        instead of touching ``self.writer`` directly)."""
        if self.writer is not None:
            with self._writer_lock:
                self.writer.add_scalar(tag, value, step)

    def _next_key(self):
        # jitted split: an *eager* jax.random.split is a per-call remote
        # dispatch over the TPU tunnel (profiled at ~0.8 s/call)
        self._key, sub = _split_key(self._key)
        return sub

    # ----------------------------------------------------------------- init

    def _canonical_placement(self, tree):
        """Pin a params/opt-state pytree to a canonical device placement.

        Under a mesh, XLA partitions a jitted program according to its
        INPUT shardings — so the same train step fed params that came from
        a fresh init, a previous train's output, or a checkpoint restore
        can reduce in different orders and differ in the last ulp. That
        context-dependence breaks bit-reproducibility guarantees
        (resume-vs-uninterrupted, repeat-run equality), so every boundary
        that rebinds params/opt state routes through this: replicated
        under the mesh, untouched otherwise.

        Only applies when every mesh device is addressable from this
        process: on a multi-process (jax.distributed) mesh, a host-side
        device_put onto the global mesh is a coordinated operation, and
        rank-0-only call sites (checkpoint restore) would deadlock the
        other ranks — there the broadcast syncs in the samplers' resume
        paths keep params consistent instead."""
        if self.mesh is None or tree is None:
            return tree
        local = set(jax.local_devices())
        if not set(self.mesh.devices.flatten()).issubset(local):
            return tree
        from nnest_tpu.parallel.mesh import replicated
        return jax.device_put(tree, replicated(self.mesh))

    def ensure_init(self, samples=None):
        """Initialize flow params (data-dependent ActNorm init when training
        data is available)."""
        if self.params is not None:
            return
        if samples is not None:
            x = jnp.asarray(samples, dtype=jnp.float32)
        else:
            x = self.model.sample_base(self._next_key(), 64)
        # jit the (pure) init: eager tracing of the whole chain is hundreds
        # of tiny dispatches — ~45 s over a remote-TPU tunnel vs <1 s jitted.
        init_fn = _shared_jit(self._config_key, 'init',
                              lambda: jax.jit(self.model.init))
        self.params = self._canonical_placement(
            init_fn(self._next_key(), x))
        self._init_optimizer()

    def _init_optimizer(self):
        mask = trainable_mask(self.params)
        self._opt = optax.chain(
            optax.masked(optax.add_decayed_weights(self.weight_decay), mask),
            optax.scale_by_adam(),
            optax.scale(-self.learning_rate),
            optax.masked(
                # hard-zero updates on frozen buffers
                optax.stateless(lambda u, p: jax.tree.map(jnp.zeros_like, u)),
                jax.tree.map(lambda m: not m, mask)),
        )
        self._opt_state = self._canonical_placement(
            self._opt.init(self.params))

    def num_params(self):
        self.ensure_init()
        return sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(self.params))

    # ------------------------------------------------------------- training

    def _make_train_fn(self, n_train, n_valid, l2_norm, max_iters):
        """Build a jitted FULL-training program for fixed data sizes.

        One dispatch runs the entire early-stopped training: a
        ``lax.while_loop`` over epochs (each a lax.scan over shuffled
        batches) carrying the best-validation params and the patience
        counter, so the patience/best-restore logic of the reference
        (``trainer.py:205-232``) costs ONE device round-trip per ``train()``
        call instead of one per epoch (or per 25-epoch chunk, the round-2
        design) — flow retraining was 54–60% of a warm 10-D nested run's
        wall clock, dominated by per-chunk dispatch+pull latency over the
        remote-TPU link. ``patience`` is a runtime operand (no recompile
        when it changes); ``max_iters`` is static (it sizes the loss-trace
        buffers).

        The tail batch trains too: when ``batch_size`` does not divide the
        training-set size, the last batch is padded with repeated rows and
        the loss is sample-masked (reference DataLoader semantics,
        ``trainer.py:179-190`` drop_last=False; shapes stay static for
        XLA)."""
        bs = min(self.batch_size, n_train)
        nb = (n_train + bs - 1) // bs
        pad = nb * bs - n_train
        model = self.model
        opt = self._opt

        def loss_fn(params, batch, w):
            lp = model.log_prob(params, batch)
            nll = -jnp.sum(lp * w) / jnp.sum(w)
            if l2_norm > 0:
                l2 = sum(jnp.sum(l ** 2)
                         for l in jax.tree_util.tree_leaves(params))
                return nll + l2_norm * l2, nll
            return nll, nll

        batch_w = np.ones((nb, bs), np.float32)
        if pad:
            batch_w[-1, bs - pad:] = 0.0
        batch_w = jnp.asarray(batch_w)

        def one_epoch(params, opt_state, key, train_data, valid_data,
                      jitter):
            kperm, knoise = jax.random.split(key)
            perm = jax.random.permutation(kperm, n_train)
            data = train_data[perm]
            if pad:
                # masked duplicate rows: values never contribute to the loss
                data = jnp.concatenate([data, data[:pad]], axis=0)
            data = data.reshape(nb, bs, -1)
            noise_keys = jax.random.split(knoise, nb)

            def body(carry, inp):
                params, opt_state = carry
                batch, w, nk = inp
                batch = batch + jitter * jax.random.normal(nk, batch.shape)
                grads, nll = jax.grad(loss_fn, has_aux=True)(
                    params, batch, w)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), nll

            (params, opt_state), nlls = jax.lax.scan(
                body, (params, opt_state), (data, batch_w, noise_keys))
            val_loss = -jnp.mean(model.log_prob(params, valid_data))
            return params, opt_state, jnp.mean(nlls), val_loss

        def train_fn(params, opt_state, key, train_data, valid_data,
                     jitter, patience):
            def cond(s):
                return jnp.logical_and(s['i'] < max_iters,
                                       s['counter'] <= patience)

            def body(s):
                key, kep = jax.random.split(s['key'])
                params, opt_state, train_loss, val_loss = one_epoch(
                    s['params'], s['opt_state'], kep, train_data,
                    valid_data, jitter)
                better = val_loss < s['best_val']
                best_params = jax.tree.map(
                    lambda b, p: jnp.where(better, p, b),
                    s['best_params'], params)
                return {
                    'i': s['i'] + 1,
                    'key': key,
                    'params': params,
                    'opt_state': opt_state,
                    'best_params': best_params,
                    'best_val': jnp.where(better, val_loss, s['best_val']),
                    'best_i': jnp.where(better, s['i'], s['best_i']),
                    'counter': jnp.where(better, 0, s['counter'] + 1),
                    'train_trace': s['train_trace'].at[s['i']].set(
                        train_loss),
                    'val_trace': s['val_trace'].at[s['i']].set(val_loss),
                }

            # finite best-val sentinel (TPU rule: keep ±inf out of kernels)
            s0 = {
                'i': jnp.int32(0),
                'key': key,
                'params': params,
                'opt_state': opt_state,
                'best_params': params,
                'best_val': jnp.float32(1e30),
                'best_i': jnp.int32(-1),
                'counter': jnp.int32(0),
                'train_trace': jnp.zeros((max_iters,), jnp.float32),
                'val_trace': jnp.zeros((max_iters,), jnp.float32),
            }
            s = jax.lax.while_loop(cond, body, s0)
            return (s['params'], s['opt_state'], s['best_params'],
                    s['best_val'], s['best_i'], s['i'],
                    s['train_trace'], s['val_trace'])

        return jax.jit(train_fn)

    def train(self,
              samples,
              max_iters=10000,
              log_interval=100,
              save_interval=100,
              jitter=0.0,
              validation_fraction=0.1,
              patience=50,
              l2_norm=0.0):
        """Maximum-likelihood training with early stopping (reference
        ``trainer.py:134-245``).

        The model is saved once at the end of training (``save_interval``
        is accepted for API compatibility; since the whole early-stopped
        run is one device program there is no mid-training host loop to
        save from — crash recovery is covered by the samplers'
        checkpoints, which persist the flow params)."""
        start = time.time()
        samples = np.asarray(samples, dtype=np.float32)
        self.ensure_init(samples)

        if self.path:
            np.save(os.path.join(self.path, 'data', 'originals.npy'), samples)

        if jitter < 0:
            # Auto-jitter: the reference smooths training data with noise
            # sigma = 0.2 x mean nearest-neighbour distance (reference
            # trainer.py:168-173). That law is dimension-pathological:
            # NN distances grow ~ the FULL inter-point distance in high-D
            # (curse of dimensionality), so at 30-D+ the per-dim noise
            # reaches the per-dim data std and training stalls — measured
            # (BENCHMARKS.md round 5): every 30/50-D production training
            # had best_epoch=1 (validation never improved past the
            # ActNorm init; the flow ran the whole nested job untrained).
            # Fix: divide by sqrt(d) above 16-D, the per-dimension share
            # of the NN distance. Probe on 30-D structured live-set-like
            # data (1000 pts): ref 0.27 -> val NLL 4.66 stalled @epoch 8;
            # /sqrt(d) 0.049 -> 1.46 @epoch 100 (the measured optimum:
            # 0.154 -> 2.53, 0.089 -> 1.75, 0 -> 1.67). At <=16-D the
            # reference law is kept verbatim — it measurably REGULARIZES
            # there (10-D structured: ref -2.105 vs /sqrt(d) -2.040) and
            # every round-4 anchor (oracles, warm walls, mixing nulls)
            # was validated under it.
            training_jitter = 0.2 * float(
                _mean_nn_distance(jnp.asarray(samples)))
            if self.x_dim > 16:
                training_jitter /= float(self.x_dim) ** 0.5
        else:
            training_jitter = float(jitter)
        self.last_training_jitter = training_jitter

        if self.log:
            self.logger.info('Number of training samples [%d]'
                             % samples.shape[0])
            self.logger.info('Training jitter [%5.4f]' % training_jitter)

        n = samples.shape[0]
        n_valid = max(1, int(round(n * validation_fraction)))
        perm = np.asarray(_perm(self._next_key(), n))
        # split in host numpy: indexing the device array is an eager gather
        # dispatch per split over the tunnel
        valid = jnp.asarray(samples[perm[:n_valid]])
        train = jnp.asarray(samples[perm[n_valid:]])
        n_train = int(train.shape[0])

        if self.mesh is not None:
            # dp-shard when the row count divides the mesh; otherwise stay
            # replicated (sharding is a layout choice — results are
            # identical either way, and uneven shards are not supported).
            from nnest_tpu.parallel.mesh import batch_sharding
            sh = batch_sharding(self.mesh)
            dp = self.mesh.shape['dp']
            if train.shape[0] % dp == 0:
                train = jax.device_put(train, sh)
            if valid.shape[0] % dp == 0:
                valid = jax.device_put(valid, sh)

        cache_key = (n_train, n_valid, float(l2_norm), int(max_iters))
        if cache_key not in self._epoch_cache:
            # The training program additionally depends on batch_size (tile
            # count/padding) on top of the architecture+optimizer config.
            skey = (None if self._config_key is None else
                    self._config_key + (self.batch_size,) + cache_key)
            self._epoch_cache[cache_key] = _shared_jit(
                skey, 'train_fn',
                lambda: self._make_train_fn(n_train, n_valid, l2_norm,
                                            int(max_iters)))
        train_fn = self._epoch_cache[cache_key]

        # ONE dispatch runs the whole early-stopped training; one batched
        # pull retrieves the scalars + loss traces (sequential
        # int()/float() pulls are one tunnel round-trip each).
        (params, opt_state, best_params, best_val_dev, best_i, n_epochs,
         train_trace, val_trace) = train_fn(
            self.params, self._opt_state, self._next_key(), train, valid,
            np.float32(training_jitter), np.int32(patience))
        best_i, best_val, n_epochs, train_trace, val_trace = jax.device_get(
            (best_i, best_val_dev, n_epochs, train_trace, val_trace))
        n_epochs = int(n_epochs)
        bi = int(best_i)
        base_iter = self.total_iters
        self.total_iters += n_epochs

        if self.log:
            for e in range(n_epochs):
                if e == 0 or (e + 1) % max(1, log_interval) == 0:
                    self.logger.info(
                        'Epoch [%i] train loss [%5.4f] validation loss '
                        '[%5.4f]' % (e + 1, float(train_trace[e]),
                                     float(val_trace[e])))
            if n_epochs < max_iters:
                self.logger.info('Epoch [%i] ran out of patience' % n_epochs)
        if self.writer is not None:
            for e in range(n_epochs):
                self.log_scalar('loss', float(val_trace[e]),
                                base_iter + e + 1)

        self.params = self._canonical_placement(best_params)
        self._opt_state = self._canonical_placement(opt_state)
        self.best_validation_epoch = bi + 1 if bi >= 0 else 0
        self.best_validation_loss = float(best_val)

        if self.path:
            self.save(os.path.join(self.path, 'models', 'netG.pkl'))
            # End-of-training real/latent/synthetic triptych, like the
            # reference always produces (trainer.py:241-245).
            if self.x_dim >= 2:
                t_plot = time.time()
                try:
                    self.plot_samples(samples, outfile=os.path.join(
                        self.path, 'plots',
                        'plot_%s.png' % self.total_iters),
                        asynchronous=True)
                except Exception as e:
                    if self.log:
                        self.logger.warning('plot_samples failed: %s' % e)
                self.plot_seconds = (getattr(self, 'plot_seconds', 0.0)
                                     + time.time() - t_plot)

        if self.log:
            self.logger.info(
                'Best epoch [%i] validation loss [%5.4f] train time (s) '
                '[%5.4f]' % (self.best_validation_epoch,
                             self.best_validation_loss,
                             time.time() - start))

    # ------------------------------------------------------ transform bridge

    def _prep(self, a):
        a = jnp.asarray(a, dtype=jnp.float32)
        if a.ndim == 1:
            a = a[None, :]
        return a

    def forward(self, x, to_numpy=False):
        """x → (z, log|det dz/dx|)."""
        self.ensure_init()
        z, logdet = self._forward(self.params, self._prep(x))
        if to_numpy:
            return np.asarray(z), np.asarray(logdet)
        return z, logdet

    def inverse(self, z, to_numpy=False):
        """z → (x, log|det dx/dz|)."""
        self.ensure_init()
        x, logdet = self._inverse(self.params, self._prep(z))
        if to_numpy:
            return np.asarray(x), np.asarray(logdet)
        return x, logdet

    def get_prior_samples(self, num_samples, to_numpy=False):
        self.ensure_init()
        z = self.model.sample_base(self._next_key(), num_samples)
        return np.asarray(z) if to_numpy else z

    def get_latent_samples(self, x, to_numpy=False):
        return self.forward(x, to_numpy=to_numpy)[0]

    def get_samples(self, z, to_numpy=False):
        return self.inverse(z, to_numpy=to_numpy)[0]

    def get_synthetic_samples(self, num_samples, to_numpy=False):
        self.ensure_init()
        x = self._sample(self.params, self._next_key(), num_samples)
        return np.asarray(x) if to_numpy else x

    def log_probs(self, x, to_numpy=False):
        self.ensure_init()
        lp = self._log_prob(self.params, self._prep(x))
        return np.asarray(lp) if to_numpy else lp

    @property
    def base_dist(self):
        return self.model.base_dist

    # --------------------------------------------------------- persistence

    def host_params(self):
        """Host copy of the current flow params, memoized on the params
        pytree's identity: ``train()``/``load()``/init rebind
        ``self.params``, so one batched tunnel pull per retrain serves
        every checkpoint written until the next retrain (checkpoints are
        written far more often than the flow retrains)."""
        if self.params is not self._host_params_src:
            # device_get issues every leaf's copy_to_host_async before
            # blocking — per-leaf np.asarray costs one tunnel round-trip
            # per parameter tensor (profiled: ~0.5 s/save for a ~50-leaf
            # flow)
            self._host_params_cache = jax.device_get(self.params)
            self._host_params_src = self.params
        return self._host_params_cache

    def save(self, path):
        with open(path, 'wb') as f:
            pickle.dump(self.host_params(), f)

    def load(self, path):
        with open(path, 'rb') as f:
            self.load_params(pickle.load(f))

    def load_params(self, tree):
        """Rebind flow params from a host pytree. Every params rebind must
        route through ``_canonical_placement`` (replicated device layout) —
        default-device placement compiles a differently-partitioned program
        whose reductions can differ in the last ulp, breaking bit-exact
        resume equality."""
        self.params = self._canonical_placement(
            jax.tree.map(jnp.asarray, tree))
        self._init_optimizer()

    def snapshot_state(self):
        """Host snapshot of the CROSS-retrain training state (params are
        checkpointed separately): Adam moments, the trainer PRNG key,
        early-stop bookkeeping, TB step counter. Together with the flow
        params this makes a retrain after resume bit-identical to the
        retrain an uninterrupted run would have executed — the optimizer
        warm-starts from persisted moments and the key stream continues
        where it left off."""
        if self._opt_state is None:
            opt_host = None
        elif self._opt_state is getattr(self, '_opt_snap_src', None):
            opt_host = self._opt_snap_cache   # unchanged since last pull
        else:
            opt_host = jax.device_get(self._opt_state)
            self._opt_snap_src = self._opt_state
            self._opt_snap_cache = opt_host
        return {
            'opt_state': opt_host,
            'key': np.asarray(jax.random.key_data(self._key)),
            'best_validation_loss': self.best_validation_loss,
            'best_validation_epoch': self.best_validation_epoch,
            'total_iters': self.total_iters,
        }

    def restore_state(self, snap):
        """Inverse of :meth:`snapshot_state`. Call AFTER ``load()`` —
        load() re-initializes the optimizer state this overwrites."""
        if snap.get('opt_state') is not None:
            self._opt_state = self._canonical_placement(
                jax.tree.map(jnp.asarray, snap['opt_state']))
        key = np.asarray(snap['key'])
        self._key = jax.random.wrap_key_data(key.astype(np.asarray(
            jax.random.key_data(self._key)).dtype))
        self.best_validation_loss = snap['best_validation_loss']
        self.best_validation_epoch = snap['best_validation_epoch']
        self.total_iters = int(snap['total_iters'])

    # --------------------------------------------------------------- plots

    def plot_samples(self, samples, outfile=None, plot_synthetic=True,
                     asynchronous=False):
        """Real/latent/synthetic triptych with 2-D grid-warp overlay
        (reference ``trainer.py:303-371``).

        RNG-neutral: the synthetic-sample draw must not advance the
        trainer's key stream, because plotting only happens on the I/O
        primary process — consuming a key here would silently desync the
        lockstep PRNG across jax.distributed processes.

        With ``asynchronous=True`` the device phase (flow transports of the
        data/grid/synthetic points) still runs on the calling thread, but
        the matplotlib render+save (~2.5 s each, the single largest phase
        of a warm 10-D nested run) happens on a daemon thread via the
        thread-safe OO API, overlapping with subsequent sampling. Call
        ``finish_plots()`` before reading the output file."""
        saved_key = self._key
        try:
            data = self._plot_samples_data(samples, plot_synthetic)
        finally:
            self._key = saved_key
        if data is None:
            return
        if asynchronous:
            import threading

            def render():
                try:
                    self._render_triptych(data, outfile)
                except Exception as e:  # never crash the worker thread
                    if self.log:
                        self.logger.warning('triptych render failed: %s' % e)

            self.finish_plots()
            # non-daemon: interpreter exit waits for the render (~2.5 s
            # worst case) instead of killing it mid-savefig and leaving a
            # truncated PNG for direct Trainer.train() callers
            self._plot_thread = threading.Thread(target=render, daemon=False)
            self._plot_thread.start()
        else:
            self._render_triptych(data, outfile)

    def finish_plots(self):
        """Join any in-flight asynchronous triptych render."""
        t = getattr(self, '_plot_thread', None)
        if t is not None:
            t.join()
            self._plot_thread = None

    def _plot_samples_data(self, samples, plot_synthetic):
        """Device phase: everything that touches the flow/TPU, pulled to
        host numpy. Returns None when matplotlib is unavailable."""
        try:
            import matplotlib  # noqa: F401 probe only
        except ImportError:
            return None
        samples = np.asarray(samples)

        def warp_grid(pts_fn, xr, yr, ng=30):
            xx = np.linspace(*xr, ng)
            yy = np.linspace(*yr, ng)
            xv, yv = np.meshgrid(xx, yy)
            xy = np.stack([xv, yv], -1).reshape(ng * ng, 2).astype(np.float32)
            return np.asarray(pts_fn(xy)).reshape(ng, ng, 2)

        data = {
            'samples': samples,
            'z': self.get_latent_samples(samples, to_numpy=True),
            'synthetic': (self.get_synthetic_samples(samples.shape[0],
                                                     to_numpy=True)
                          if plot_synthetic else None),
            'grids': None,
            'total_iters': self.total_iters,
        }
        if self.x_dim == 2:
            data['grids'] = (
                warp_grid(lambda g: self.get_samples(g, to_numpy=True),
                          (-3, 3), (-3, 3)),
                warp_grid(
                    lambda g: self.get_latent_samples(g, to_numpy=True),
                    (samples[:, 0].min() - .1, samples[:, 0].max() + .1),
                    (samples[:, 1].min() - .1, samples[:, 1].max() + .1)))
        return data

    def _render_triptych(self, data, outfile):
        """Render phase: pure numpy + matplotlib OO API (no pyplot global
        state), safe to run on a worker thread."""
        try:
            from matplotlib import collections as mc
            from matplotlib.backends.backend_agg import FigureCanvasAgg
            from matplotlib.figure import Figure
        except ImportError:
            return
        samples, z = data['samples'], data['z']
        ncols = 3 if data['synthetic'] is not None else 2
        fig = Figure(figsize=(4 * ncols + 1, 5))
        FigureCanvasAgg(fig)
        ax = fig.subplots(1, ncols)
        ax[0].scatter(samples[:, 0], samples[:, 1], c='r', s=5, alpha=0.5)
        ax[0].set_title('Real data')

        def add_grid(axis, xs):
            # warped grid lines along both mesh directions
            for p1, p2 in ((xs[1:, :, :], xs[:-1, :, :]),
                           (xs[:, 1:, :], xs[:, :-1, :])):
                axis.add_collection(mc.LineCollection(
                    list(zip(p1.reshape(-1, 2), p2.reshape(-1, 2))),
                    linewidths=1, alpha=0.2, color='k'))

        if data['grids'] is not None:
            add_grid(ax[0], data['grids'][0])
            add_grid(ax[1], data['grids'][1])
        ax[1].scatter(z[:, 0], z[:, 1], c='r', s=5, alpha=0.5)
        ax[1].set_title('Latent data')
        if data['synthetic'] is not None:
            xs = data['synthetic']
            ax[2].scatter(xs[:, 0], xs[:, 1], c='r', s=5, alpha=0.5)
            ax[2].set_title('Synthetic data')
        fig.tight_layout()
        if outfile is not None:
            fig.savefig(outfile)
        if self.writer is not None:
            # real + latent scatter to TensorBoard (reference
            # trainer.py:367-371) plus the training-data 'originals'
            # scatter (reference trainer.py:160-166); writer access is
            # serialized against main-thread scalar writes.
            try:
                fig0 = Figure(figsize=(5, 5))
                FigureCanvasAgg(fig0)
                ax0 = fig0.subplots(1, 1)
                ax0.scatter(samples[:, 0], samples[:, 1], c='r', s=5,
                            alpha=0.5)
                ax0.set_title('Originals')
                with self._writer_lock:
                    self.writer.add_figure('latent', fig,
                                           data['total_iters'])
                    self.writer.add_figure('originals', fig0,
                                           data['total_iters'])
            except Exception:
                pass


def _make_writer(path):
    """TensorBoard writer when available (torch is in the image), else a
    no-op stub (reference logs scalars/figures via SummaryWriter,
    ``trainer.py:129``)."""
    try:
        from torch.utils.tensorboard import SummaryWriter
        return SummaryWriter(path)
    except Exception:
        class _Null:
            def add_scalar(self, *a, **k):
                pass

            def add_figure(self, *a, **k):
                pass

            def close(self):
                pass
        return _Null()
