"""Latent base distributions (TPU-native equivalents of the reference's
torch.distributions usage and ``nnest/distributions/generalised_normal.py``)."""

from nnest_tpu.distributions.base import (
    BaseDistribution,
    DiagNormal,
    GeneralisedNormal,
    LogitUniform,
)

__all__ = ['BaseDistribution', 'DiagNormal', 'GeneralisedNormal', 'LogitUniform']
