"""Multi-device / multi-host scaling (mesh + sharded steps)."""

from nnest_tpu.parallel.mesh import (
    initialize_distributed, get_mesh, batch_sharding, replicated,
    shard_batch, params_sharding_tree, shard_params)
from nnest_tpu.parallel.sharded import (
    make_sharded_train_step, make_sharded_mcmc)

__all__ = [
    'initialize_distributed', 'get_mesh', 'batch_sharding', 'replicated',
    'shard_batch', 'params_sharding_tree', 'shard_params',
    'make_sharded_train_step', 'make_sharded_mcmc',
]
