from .logging import logger, set_log_level
from .tracing import trace_span, TraceChannel
