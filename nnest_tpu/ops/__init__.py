"""Hot-path compute ops: packed/gather-free spline inverse (XLA) and the
fused Pallas kernel variant."""

from nnest_tpu.ops.fused_spline import (
    is_fusable_spline, pack_inverse_consts, fused_inverse_fn)

__all__ = ['is_fusable_spline', 'pack_inverse_consts', 'fused_inverse_fn']
