"""nnest_tpu — TPU-native neural nested sampling and MCMC.

A ground-up JAX/XLA rebuild of the capabilities of nnest (reference:
``nnest/__init__.py:1-5``): normalizing flows map the target posterior to a
unit-Gaussian latent space; latent-space proposals (constrained Metropolis,
rejection, density, ensemble) drive nested-sampling evidence estimation and
posterior MCMC.  Everything batched/compiled for TPU: flows are pure functions
over pytree params, MCMC trajectories are single ``lax.scan`` programs with
vmapped chains, likelihoods are batched pure-JAX functions, and scaling is via
``jax.sharding`` over device meshes rather than MPI.
"""

__version__ = '0.1.0'

__all__ = ['NestedSampler', 'DynamicNestedSampler', 'MCMCSampler',
           'EnsembleSampler', 'Trainer', '__version__']

_LAZY = {
    'NestedSampler': 'nnest_tpu.samplers.nested',
    'DynamicNestedSampler': 'nnest_tpu.samplers.dynamic',
    'MCMCSampler': 'nnest_tpu.samplers.mcmc',
    'EnsembleSampler': 'nnest_tpu.samplers.ensemble',
    'Trainer': 'nnest_tpu.training.trainer',
}


def __getattr__(name):
    # Lazy imports keep `import nnest_tpu` cheap (no jax warm-up) for users
    # who only need a subpackage.
    if name in _LAZY:
        import importlib
        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(name)
