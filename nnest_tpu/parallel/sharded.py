"""Sharded training and sampling steps over a device mesh.

The multi-chip equivalents of the reference's MPI fan-outs: likelihood
farming + candidate pooling (``nnest/nested.py:199-226,362-373``) become
dp-sharded chain/live-point batches (XLA inserts the psum/all-gather
collectives over ICI), and flow training becomes dp-sharded batches with
automatically psum-med gradients. The tiny conditioner MLPs optionally shard
their hidden dimension over 'tp'.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import optax

from nnest_tpu.parallel.mesh import (
    batch_sharding, params_sharding_tree)


def make_sharded_train_step(model, optimizer, mesh, l2_norm=0.0):
    """One dp-sharded NLL training step: batch sharded over 'dp', params
    sharded per ``params_sharding_tree``; grads are reduced by XLA."""

    def loss_fn(params, batch):
        nll = -jnp.mean(model.log_prob(params, batch))
        if l2_norm > 0:
            l2 = sum(jnp.sum(l ** 2)
                     for l in jax.tree_util.tree_leaves(params))
            nll = nll + l2_norm * l2
        return nll

    @jax.jit
    def step(params, opt_state, key, batch, jitter):
        batch = batch + jitter * jax.random.normal(key, batch.shape)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def run(params, opt_state, key, batch, jitter=0.0):
        batch = jax.device_put(batch, batch_sharding(mesh))
        params = jax.device_put(params, params_sharding_tree(params, mesh))
        return step(params, opt_state, key, batch, jnp.float32(jitter))

    return run


def make_sharded_mcmc(kernels, mesh):
    """Run the latent Metropolis kernel with the chain axis sharded over
    'dp'. The kernel body is already pure vectorized jnp, so sharding the
    inputs is sufficient — XLA partitions the scan across devices (SPMD) and
    only the scalar step-size/counter reductions cross chips."""

    def run(params, key, z0, logl0, derived0, logl_prior0, **kw):
        sh = batch_sharding(mesh)
        z0 = jax.device_put(z0, sh)
        logl0 = jax.device_put(logl0, sh)
        derived0 = jax.device_put(derived0, sh)
        logl_prior0 = jax.device_put(logl_prior0, sh)
        params = jax.device_put(params, params_sharding_tree(params, mesh))
        return kernels.mcmc(params, key, z0, logl0, derived0, logl_prior0,
                            **kw)

    return run
