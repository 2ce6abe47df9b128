"""Measure the per-step host<->device worklist round-trip (VERDICT #9).

Every render step uploads the whole worklist and blocks on downloading
it back (runtime/app.py ipu_render span) - reference parity (20B/pixel
both ways, src/PathTracerApp.cpp:425-475).  This quantifies that cost
vs pure device time at interactive (8 spp) and full (300 spp) step
sizes to decide whether a device-resident film mode is worth having.

Measured on the attached v5e via the axon tunnel (scripts/xfer probes,
2026-08-17): device->host first use pays a ~174 s per-process
initialisation, then transfers run at ~27 MB/s down / ~39 MB/s up with
a ~40 ms per-transfer latency floor.  At 1104x1000 the 7-array SoA
round-trip is therefore ~1.8 s/step - ~40% of a 300 spp step and ~25x
an 8 spp interactive step - which is why `--device-film` exists.  On a
direct PCIe host (>=10 GB/s) the same round-trip is ~6 ms: <1% at
300 spp, ~8% at 8 spp.  Default frame here is 512x512 so the script
completes quickly through the tunnel; set RT_SIZE=1104x1000 for the
full-frame numbers.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WIDTH, HEIGHT = map(int, os.environ.get("RT_SIZE", "512x512").split("x"))


def main():
    from ipu_path_trace_tpu.core.records import (
        from_device_batch, make_worklist, to_device_batch,
    )
    from ipu_path_trace_tpu.core.scene import default_scene
    from ipu_path_trace_tpu.models.envlight import NifEnv
    from ipu_path_trace_tpu.models.nif import make_params, make_synthetic_nif
    from ipu_path_trace_tpu.render.params import RenderSettings, StaticConfig
    from ipu_path_trace_tpu.render.wavefront import make_base_key, render_step

    print(f"device: {jax.devices()[0]}")
    scene = default_scene()
    weights, meta = make_synthetic_nif(key=0)
    env = NifEnv(params=make_params(weights, meta, jnp.bfloat16))
    cfg = StaticConfig(width=WIDTH, height=HEIGHT)
    records = make_worklist(WIDTH, HEIGHT)
    key = make_base_key(0)
    sync = jax.jit(lambda w: w.r[0] + w.b[-1])

    for spp in (8, 300):
        settings = RenderSettings.make(samples_per_step=spp)
        # warmup/compile
        wd = to_device_batch(records)
        out = render_step(scene, settings, cfg, wd, key, env)
        float(sync(out))

        reps = 10 if spp == 8 else 3
        # (a) full loop body: upload + render + download (app.py behaviour)
        t0 = time.monotonic()
        for i in range(reps):
            wd = to_device_batch(records)
            out = render_step(scene, settings, cfg, wd, key, env)
            _ = from_device_batch(out)
        full_s = (time.monotonic() - t0) / reps

        # (b) device-resident: render chained on device, fetch only a scalar
        t0 = time.monotonic()
        out = wd
        for i in range(reps):
            out = render_step(scene, settings, cfg, out, key, env)
        float(sync(out))
        dev_s = (time.monotonic() - t0) / reps

        print(f"spp={spp:4d}: loop-body {full_s*1e3:8.1f} ms | device-only "
              f"{dev_s*1e3:8.1f} ms | host round-trip {100*(full_s-dev_s)/full_s:5.1f}% of step")


if __name__ == "__main__":
    main()
