"""Profiling hooks.

The reference's only profiling is the cudnnFind* autotuner and a
commented-out per-algo log (resnet_cudnn_fast.cu:1285-1299). On TPU the
equivalents are jax.profiler traces (consumed by XProf/TensorBoard) and
XLA HLO dumps; this module wraps them behind one context manager.
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional

import jax


@contextlib.contextmanager
def trace_context(trace_dir: Optional[str] = None, *, hlo_dump: Optional[str] = None):
    """Profile the enclosed steps. trace_dir enables jax.profiler; hlo_dump
    sets XLA_FLAGS dump (must be set before first compile to take effect)."""
    if hlo_dump:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + f" --xla_dump_to={hlo_dump}"
        ).strip()
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        if trace_dir:
            jax.profiler.stop_trace()
