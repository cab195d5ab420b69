"""Utilities: config tree, profiling/step timing."""

from paif_tpu.utils.config import Config, load_config
from paif_tpu.utils.profiler import StepTimer, trace_context

__all__ = ["Config", "load_config", "StepTimer", "trace_context"]
