"""Named phase tracing - the PVTI equivalent.

The reference instruments every phase with PVTI tracepoints and a live
throughput series (reference: src/PathTracerApp.cpp:313,357-364,636-776,
src/ipu_utils.hpp:475-513).  Here each channel records wall-clock spans
(queryable for perf regression tests) and can optionally bridge into the
JAX profiler (jax.profiler.TraceAnnotation) so spans show up in
TensorBoard traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax.profiler

from .logging import logger


class TraceChannel:
    """A named channel accumulating (count, total_seconds) per span name."""

    def __init__(self, name: str):
        self.name = name
        self.spans: dict[str, list[float]] = defaultdict(list)

    @contextlib.contextmanager
    def span(self, span_name: str):
        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation(f"{self.name}/{span_name}"):
            try:
                yield
            finally:
                dt = time.perf_counter() - t0
                self.spans[span_name].append(dt)
                logger().log(5, "span %s/%s: %.3fms", self.name, span_name, dt * 1e3)

    def total(self, span_name: str) -> float:
        return sum(self.spans.get(span_name, []))

    def report(self) -> dict[str, dict]:
        return {
            k: {"count": len(v), "total_s": sum(v), "mean_ms": 1e3 * sum(v) / len(v)}
            for k, v in self.spans.items()
            if v
        }


@contextlib.contextmanager
def trace_span(channel: TraceChannel | None, name: str):
    if channel is None:
        yield
    else:
        with channel.span(name):
            yield
