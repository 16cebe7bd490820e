from .tracing import Span, traced_action, get_recorded_spans, clear_recorded_spans
from .metrics import TaskMetricsCollector, counted
from .streaming import BatchRecord, StreamingMetricsCollector

__all__ = [
    "Span",
    "traced_action",
    "get_recorded_spans",
    "clear_recorded_spans",
    "TaskMetricsCollector",
    "counted",
    "BatchRecord",
    "StreamingMetricsCollector",
]
