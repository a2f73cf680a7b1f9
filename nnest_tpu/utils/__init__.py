"""Cross-cutting utilities: diagnostics, logging/run dirs, profiling,
sample buffer."""

from nnest_tpu.utils.evaluation import (
    effective_sample_size, acceptance_rate, mean_jump_distance,
    gelman_rubin_diagnostic, integrated_autocorr_time)
from nnest_tpu.utils.logger import create_logger, get_or_create_run_dir
from nnest_tpu.utils.buffer import SampleBuffer
from nnest_tpu.utils.profiling import trace_annotation, device_trace, \
    StepTimer

__all__ = [
    'effective_sample_size', 'acceptance_rate', 'mean_jump_distance',
    'gelman_rubin_diagnostic', 'integrated_autocorr_time',
    'create_logger', 'get_or_create_run_dir', 'SampleBuffer',
    'trace_annotation', 'device_trace', 'StepTimer',
]
