"""Invertible bijectors (pure-function equivalents of nnest/networks.py)."""

from nnest_tpu.bijectors.base import Bijector, Chain
from nnest_tpu.bijectors.affine import (
    ActNorm, ScaleLayer, AffineCoupling, alternating_mask)
from nnest_tpu.bijectors.cholesky import CholeskyLinear
from nnest_tpu.bijectors.conv1x1 import Invertible1x1Conv
from nnest_tpu.bijectors.spline import SplineCoupling
from nnest_tpu.bijectors.rqs import rqs

__all__ = [
    'Bijector', 'Chain', 'ActNorm', 'ScaleLayer', 'AffineCoupling',
    'alternating_mask', 'CholeskyLinear', 'Invertible1x1Conv',
    'SplineCoupling', 'rqs',
]
