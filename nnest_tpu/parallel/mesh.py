"""Device mesh + sharding utilities.

TPU-native replacement for the reference's MPI layer
(``nnest/sampler.py:165-177``, ``nnest/nested.py:199-226,362-373,416-427``).
The reference runs a replicated sequential loop per MPI rank and pools
candidate points with gather/bcast; here the same data parallelism is
expressed as sharded batch axes on a ``jax.sharding.Mesh``: chains/live
points/training batches are sharded over the 'dp' axis (collectives ride
ICI), and the small conditioner MLPs can additionally shard their hidden
dimension over 'tp'. Multi-host runs use ``jax.distributed.initialize`` with
process 0 as the I/O primary, mirroring the reference's rank-0 convention
(``sampler.py:177``).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(**kwargs):
    """Multi-process bring-up (DCN across hosts). Safe to call when already
    initialized or single-process."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass


def get_mesh(devices=None, dp=None, tp=1):
    """Build a (dp, tp) mesh. Defaults: all devices on the dp axis."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, 'dp*tp must equal device count'
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=('dp', 'tp'))


def batch_sharding(mesh):
    """Shard the leading (chains / live points / batch) axis over dp."""
    return NamedSharding(mesh, P('dp'))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(x, mesh):
    """Place a (batch, ...) array with its leading axis sharded over dp.
    Pads the batch up to a multiple of dp if needed (returns array, pad)."""
    dp = mesh.shape['dp']
    n = x.shape[0]
    pad = (-n) % dp
    if pad:
        x = np.concatenate([np.asarray(x),
                            np.asarray(x)[:pad]], axis=0)
    return jax.device_put(x, batch_sharding(mesh)), pad


def params_sharding_tree(params, mesh, min_dim=128):
    """Sharding tree for flow params: MLP weight matrices shard their
    output (hidden) dim over 'tp' when it is divisible by tp AND at least
    ``min_dim`` wide; everything else is replicated. With tp=1 this is
    full replication (pure DP).

    ``min_dim`` defaults to one MXU tile (128): below that, splitting a
    matmul that already underfills a single tile only adds collectives —
    production conditioners (hidden 16-64) therefore replicate even at
    tp>1, and the tp axis engages only for >=128-hidden flows (where it
    is correctness-validated by tests/test_tp_sharding.py; see the
    BENCHMARKS.md round-5 tp note for the measured argument)."""
    tp = mesh.shape['tp']

    def spec_for(path, leaf):
        if tp > 1 and hasattr(leaf, 'ndim') and leaf.ndim == 2:
            if leaf.shape[1] % tp == 0 and leaf.shape[1] >= min_dim:
                return NamedSharding(mesh, P(None, 'tp'))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh):
    return jax.device_put(params, params_sharding_tree(params, mesh))


def broadcast_exact(tree):
    """``multihost_utils.broadcast_one_to_all`` that preserves 64-bit
    leaves exactly.

    With ``jax_enable_x64`` off (the repo default), the stock broadcast
    device_puts every 64-bit leaf at 32 bits (float64→float32,
    int64/uint64→int32), silently truncating resume state (live-point
    log-likelihoods, evidence accumulators, likelihood counters above
    2^24) on EVERY process — including rank 0, which overwrites the
    exact values it just loaded from disk with the round-tripped 32-bit
    copies. Here every 8-byte-itemsize leaf rides the collective bitcast
    as int32 (exactly representable; int32 survives device_put
    unchanged) and is bitcast back — dtype AND shape (including 0-d
    scalars) — on arrival. Narrower leaves pass through untouched.
    """
    from jax.experimental import multihost_utils as mh

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    enc = []
    for leaf in leaves:
        a = np.asarray(leaf)
        if a.dtype.itemsize == 8:
            flat = np.ascontiguousarray(a).reshape(-1)  # 0-d safe view
            enc.append(((a.dtype, a.shape), flat.view(np.int32)))
        else:
            enc.append((None, a))
    out = mh.broadcast_one_to_all(tuple(a for _, a in enc))
    dec = [np.ascontiguousarray(o).view(tag[0]).reshape(tag[1])
           if tag is not None else np.asarray(o)
           for (tag, _), o in zip(enc, out)]
    return jax.tree_util.tree_unflatten(treedef, dec)
