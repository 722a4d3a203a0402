from .debug import check_state_finite, nonfinite_report
from .logging import MetricsLogger
from .profiling import trace_context

__all__ = [
    "check_state_finite",
    "nonfinite_report",
    "MetricsLogger",
    "trace_context",
]
