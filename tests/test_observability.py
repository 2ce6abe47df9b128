"""Smoke coverage for the observability features: --profile-dir (the
PVTI analog: an xprof/XLA profiler trace of the render loop) and
--device-timing (the cycle-counter analog: per-phase device-time split
logged before the loop).  Both must work headless on any backend."""

import os

import numpy as np

from ipu_path_trace_tpu.runtime.app import PathTracerApp
from ipu_path_trace_tpu.runtime.config import Config


def _base_cfg(tmp_path, **kw):
    base = dict(
        outfile=str(tmp_path / "obs.png"),
        assets="constant:0.8,0.7,0.6",
        width=16,
        height=16,
        samples=4,
        samples_per_step=2,
        seed=3,
    )
    base.update(kw)
    return Config(**base)


def test_profile_dir_writes_trace(tmp_path):
    prof = tmp_path / "trace"
    cfg = _base_cfg(tmp_path, profile_dir=str(prof))
    app = PathTracerApp(cfg)
    app.init()
    app.build()
    film = app.execute()
    assert np.isfinite(film.hdr).all()
    # jax.profiler.start_trace/stop_trace wrote something under the dir:
    found = [os.path.join(r, f) for r, _, fs in os.walk(prof) for f in fs]
    assert found, "profiler trace directory is empty"


def test_device_timing_logs_split(tmp_path):
    import logging

    from ipu_path_trace_tpu.utils.logging import logger

    cfg = _base_cfg(tmp_path, device_timing=True)
    app = PathTracerApp(cfg)
    app.init()
    app.build()
    records = []

    class _Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    h = _Capture()
    logger().addHandler(h)
    try:
        app.execute()
    finally:
        logger().removeHandler(h)
    timing = [m for m in records if "Device phase timing" in m]
    assert timing, records[:10]
    assert "step=" in timing[0] and "Mpaths/s" in timing[0]
