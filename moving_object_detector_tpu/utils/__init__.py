"""Utilities: per-stage profiling, checkpoint/resume, logging."""

from .profiling import StageTimer, trace_context
from .checkpoint import (
    restore_flow_params,
    restore_pipeline_state,
    save_flow_params,
    save_pipeline_state,
)

__all__ = [
    "StageTimer",
    "trace_context",
    "restore_flow_params",
    "restore_pipeline_state",
    "save_flow_params",
    "save_pipeline_state",
]
