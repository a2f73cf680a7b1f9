"""Samplers: nested, MCMC, ensemble + device-resident kernels."""

from nnest_tpu.samplers.base import Sampler
from nnest_tpu.samplers.kernels import LatentKernels
from nnest_tpu.samplers.nested import NestedSampler
from nnest_tpu.samplers.mcmc import MCMCSampler
from nnest_tpu.samplers.ensemble import EnsembleSampler

__all__ = ['Sampler', 'LatentKernels', 'NestedSampler', 'MCMCSampler',
           'EnsembleSampler']
