"""Flow models (base distribution + bijector chain)."""

from nnest_tpu.flows.model import FlowModel, FastSlowFlowModel
from nnest_tpu.flows.factory import build_flow

__all__ = ['FlowModel', 'FastSlowFlowModel', 'build_flow']
