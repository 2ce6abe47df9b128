"""Fused megastep vs per-sample kernel pair at the canonical bench shape."""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WIDTH, HEIGHT = 1104, 1000
LOOP = 16
REPS = 3


def main():
    from ipu_path_trace_tpu.core.records import make_worklist, to_device_batch
    from ipu_path_trace_tpu.core.scene import default_scene
    from ipu_path_trace_tpu.models.envlight import NifEnv
    from ipu_path_trace_tpu.models.nif import make_params, make_synthetic_nif
    from ipu_path_trace_tpu.render.params import RenderSettings, StaticConfig
    from ipu_path_trace_tpu.render.wavefront import render_step_impl

    print(f"device: {jax.devices()[0]}")
    scene = default_scene()
    weights, meta = make_synthetic_nif(key=0)
    env = NifEnv(params=make_params(weights, meta, jnp.bfloat16))
    work = to_device_batch(make_worklist(WIDTH, HEIGHT))
    settings = RenderSettings.make(samples_per_step=LOOP)

    for fused in (False, True):
        cfg = StaticConfig(width=WIDTH, height=HEIGHT, use_fused_step=fused)

        @jax.jit
        def step(work, key):
            return render_step_impl(scene, settings, cfg, work, key, env).r[0]

        t0 = time.monotonic()
        float(step(work, jax.random.key(5)))
        print(f"fused={fused}: compile+1st {time.monotonic()-t0:.1f}s")
        t0 = time.monotonic()
        for i in range(REPS):
            float(step(work, jax.random.key(i)))
        dt = (time.monotonic() - t0) / (REPS * LOOP)
        print(f"fused={fused}: {dt*1e3:8.2f} ms/sample  "
              f"({WIDTH*HEIGHT/dt/1e6:7.1f} Mpaths/s)")


if __name__ == "__main__":
    main()
