from .tracing import Span, traced_action, get_recorded_spans, clear_recorded_spans
from .metrics import TaskMetricsCollector, counted

__all__ = [
    "Span",
    "traced_action",
    "get_recorded_spans",
    "clear_recorded_spans",
    "TaskMetricsCollector",
    "counted",
]
