"""MCMC sampler: flow-guided Metropolis chains for posterior sampling.

Equivalent of the reference ``MCMCSampler`` (``nnest/mcmc.py:18-126``): train
the flow on provided (normalized) samples, then run vectorized latent-space
Metropolis chains with the full MH ratio (no likelihood constraint). The
chain trajectory is one jitted ``lax.scan`` — see kernels.py.
"""

from __future__ import annotations


import numpy as np

from nnest_tpu.samplers.ensemble import EnsembleSampler


class MCMCSampler(EnsembleSampler):

    def __init__(self, x_dim, loglike, prior=None, **kwargs):
        self.sampler = 'mcmc'
        super().__init__(x_dim, loglike, prior=prior, **kwargs)

    def run(self,
            mcmc_steps,
            mcmc_num_chains,
            training_samples,
            mcmc_dynamic_step_size=True,
            stats_interval=100,
            output_interval=None,
            initial_jitter=0.01,
            final_jitter=0.01,
            init_samples=None):
        """(reference ``mcmc.py:79-126``)"""
        training_samples = np.asarray(training_samples, dtype=np.float64)
        mean = np.mean(training_samples, axis=0)
        std = np.std(training_samples, axis=0)
        normalized = (training_samples - mean) / std
        # De-normalization becomes the sampler transform
        # (reference mcmc.py:107-111).
        self.transform = lambda x: x * std + mean
        self.invalidate_kernels()
        self.trainer.train(normalized, jitter=initial_jitter)

        samples, latent, derived, loglikes, scale, ncall = \
            self._mcmc_sample(mcmc_steps, num_chains=mcmc_num_chains,
                              dynamic_step_size=mcmc_dynamic_step_size,
                              stats_interval=stats_interval,
                              output_interval=output_interval,
                              init_samples=init_samples)

        samples = self.transform(
            samples.reshape(-1, self.x_dim)).reshape(samples.shape)
        if mcmc_steps > 1:
            self._chain_stats(samples)
        self._plot_trace(samples, latent)  # reference sampler.py:460-461

        self._join_plots()
        self.samples = np.concatenate((samples, derived), axis=2)
        self.latent_samples = latent
        self.loglikes = loglikes
        self.logger.info('ncall: {:d}\n'.format(self.total_calls))
        return self.samples
