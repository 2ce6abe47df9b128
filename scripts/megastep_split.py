"""In-kernel split of the fused megastep: stub out the NIF or the trace.

Uses the first-class ``stub=`` knob of render_megastep_pallas (the same
mechanism --device-timing uses, ops/megastep_pallas._stub_*) to see
where the fused kernel's time goes.  Optional argv: NIF assets dir
(default: the canonical 6x320 procedural_sky_nif).
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

WIDTH, HEIGHT = 1104, 1000
LOOP = 300
REPS = 2


def run(name: str, params, stub: str | None):
    from ipu_path_trace_tpu.core.records import make_worklist, to_device_batch
    from ipu_path_trace_tpu.core.scene import default_scene
    from ipu_path_trace_tpu.ops.megastep_pallas import render_megastep_pallas
    from ipu_path_trace_tpu.render.params import RenderSettings

    scene = default_scene()
    work = to_device_batch(make_worklist(WIDTH, HEIGHT))
    settings = RenderSettings.make(samples_per_step=LOOP)
    cols = work.u.astype(jnp.float32)
    rows = work.v.astype(jnp.float32)

    def step(i):
        out = render_megastep_pallas(
            scene, settings, params, cols, rows,
            jnp.asarray([i, i + 3], jnp.int32),
            width=WIDTH, height=HEIGHT, max_path_length=10, stub=stub,
        )
        return out.radiance.x[0]

    f = jax.jit(step, static_argnums=())
    float(f(0))
    t0 = time.monotonic()
    for i in range(REPS):
        float(f(i))
    dt = (time.monotonic() - t0) / (REPS * LOOP)
    print(f"{name:12s} {dt*1e3:8.2f} ms/sample "
          f"({WIDTH*HEIGHT/dt/1e6:6.1f} Mpaths/s)")


def main() -> int:
    from ipu_path_trace_tpu.models.nif import load_nif_assets

    asset = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "assets",
        "procedural_sky_nif",
    )
    params, _m, _w = load_nif_assets(asset, jnp.bfloat16)
    print(f"assets: {asset}")
    run("full", params, None)
    run("nif-only", params, "trace")
    run("trace-only", params, "nif")
    run("neither", params, "both")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
