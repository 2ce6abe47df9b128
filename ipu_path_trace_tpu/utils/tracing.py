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
        # (count, total_seconds) per span - O(1) memory however long the
        # render session runs:
        self.spans: dict[str, list[float]] = defaultdict(lambda: [0, 0.0])

    @contextlib.contextmanager
    def span(self, span_name: str):
        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation(f"{self.name}/{span_name}"):
            try:
                yield
            finally:
                dt = time.perf_counter() - t0
                acc = self.spans[span_name]
                acc[0] += 1
                acc[1] += dt
                logger().log(5, "span %s/%s: %.3fms", self.name, span_name, dt * 1e3)

    def total(self, span_name: str) -> float:
        return self.spans[span_name][1] if span_name in self.spans else 0.0

    def report(self) -> dict[str, dict]:
        return {
            k: {"count": int(c), "total_s": t, "mean_ms": 1e3 * t / c}
            for k, (c, t) in self.spans.items()
            if c
        }


@contextlib.contextmanager
def trace_span(channel: TraceChannel | None, name: str):
    if channel is None:
        yield
    else:
        with channel.span(name):
            yield
