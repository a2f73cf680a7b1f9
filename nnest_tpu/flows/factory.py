"""Flow factory: build a FlowModel from the reference's string keys.

Mirrors the Trainer flow selection (``nnest/trainer.py:83-100``) and the
concrete model constructors ``SingleSpeedCholeksy`` (``networks.py:235``),
``SingleSpeedNVP`` (``networks.py:328``), ``FastSlowNVP`` (``networks.py:
350``), ``SingleSpeedSpline`` (``networks.py:708``) and ``FastSlowSpline``
(``networks.py:718``). Both the reference's 'choleksy' misspelling and
'cholesky' are accepted.
"""

from __future__ import annotations

from nnest_tpu.bijectors import (
    ActNorm, ScaleLayer, AffineCoupling, alternating_mask, CholeskyLinear,
    Invertible1x1Conv, SplineCoupling, Chain)
from nnest_tpu.distributions import BaseDistribution, DiagNormal
from nnest_tpu.flows.model import FlowModel, FastSlowFlowModel


def _nvp_chain(dim, hidden, num_blocks, num_layers, scale=''):
    """Alternating-mask RealNVP blocks (reference ``networks.py:328-347``)."""
    translate_only = scale in ('translate', 'constant')
    flows = []
    for b in range(num_blocks):
        flows.append(AffineCoupling(
            dim=dim, hidden=hidden, mask=alternating_mask(dim, start=b % 2),
            num_layers=num_layers, s_act='tanh', t_act='relu',
            translate_only=translate_only))
        if scale == 'constant':
            flows.append(ScaleLayer(dim=dim))
    return Chain(tuple(flows))


def _spline_chain(dim, hidden, num_blocks, num_bins=8, tail_bound=3.0):
    """[ActNorm, Inv1x1Conv, SplineCoupling] × blocks (reference
    ``networks.py:708-715``)."""
    flows = []
    for _ in range(num_blocks):
        flows.append(ActNorm(dim=dim))
        flows.append(Invertible1x1Conv(dim=dim))
        flows.append(SplineCoupling(dim=dim, num_bins=num_bins,
                                    tail_bound=tail_bound, hidden=hidden))
    return Chain(tuple(flows))


def _combine_coupling(num_slow, num_fast):
    """Slow-masking coupling combining fast/slow blocks (reference
    ``networks.py:112-120``)."""
    dim = num_slow + num_fast
    mask = tuple([1.0] * num_slow + [0.0] * num_fast)
    return AffineCoupling(dim=dim, hidden=64, mask=mask, num_layers=1,
                          s_act='tanh', t_act='relu')


def build_flow(x_dim: int,
               flow: str = 'spline',
               hidden_dim: int = 16,
               num_slow: int = 0,
               num_blocks: int = 3,
               num_layers: int = 1,
               scale: str = '',
               base_dist: BaseDistribution = None,
               num_bins: int = 8,
               tail_bound: float = 3.0) -> FlowModel:
    if base_dist is None:
        base_dist = DiagNormal(dim=x_dim)
    assert x_dim > num_slow
    num_fast = x_dim - num_slow
    name = flow.lower()

    if name in ('choleksy', 'cholesky'):
        chain = Chain((CholeskyLinear(dim=x_dim),))
        return FlowModel(dim=x_dim, chain=chain, base_dist=base_dist)

    if name == 'nvp':
        if num_slow > 0:
            return FastSlowFlowModel(
                dim=x_dim, chain=None, base_dist=base_dist, num_slow=num_slow,
                slow_chain=_nvp_chain(num_slow, hidden_dim, num_blocks,
                                      num_layers, scale=''),
                fast_chain=_nvp_chain(num_fast, hidden_dim, num_blocks,
                                      num_layers, scale=''),
                combine=_combine_coupling(num_slow, num_fast))
        chain = _nvp_chain(x_dim, hidden_dim, num_blocks, num_layers,
                           scale=scale)
        return FlowModel(dim=x_dim, chain=chain, base_dist=base_dist)

    if name == 'spline':
        if num_slow > 0:
            # Reference quirk preserved: fast block uses hidden 16
            # (networks.py:722), slow block uses hidden_dim (networks.py:727).
            return FastSlowFlowModel(
                dim=x_dim, chain=None, base_dist=base_dist, num_slow=num_slow,
                slow_chain=_spline_chain(num_slow, hidden_dim, num_blocks,
                                         num_bins, tail_bound),
                fast_chain=_spline_chain(num_fast, 16, num_blocks,
                                         num_bins, tail_bound),
                combine=_combine_coupling(num_slow, num_fast))
        chain = _spline_chain(x_dim, hidden_dim, num_blocks, num_bins,
                              tail_bound)
        return FlowModel(dim=x_dim, chain=chain, base_dist=base_dist)

    raise NotImplementedError('Unknown flow type: %r' % flow)
