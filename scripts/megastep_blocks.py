"""Block-size sweep for the fused megastep kernel.

Optional argv: NIF assets dir and block list, e.g.
  python scripts/megastep_blocks.py assets/nif_w192 512 1024 2048 4096
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WIDTH, HEIGHT = 1104, 1000
LOOP = 300
REPS = 3


def main():
    from ipu_path_trace_tpu.core.records import make_worklist, to_device_batch
    from ipu_path_trace_tpu.core.scene import default_scene
    from ipu_path_trace_tpu.models.envlight import NifEnv
    from ipu_path_trace_tpu.models.nif import make_params, make_synthetic_nif
    from ipu_path_trace_tpu.ops.megastep_pallas import render_megastep_pallas
    from ipu_path_trace_tpu.render.params import RenderSettings

    scene = default_scene()
    if len(sys.argv) > 1 and not sys.argv[1].isdigit():
        from ipu_path_trace_tpu.models.nif import load_nif_assets

        params, _m, _w = load_nif_assets(sys.argv[1], jnp.bfloat16)
        print(f"assets: {sys.argv[1]}")
    else:
        weights, meta = make_synthetic_nif(key=0)
        params = make_params(weights, meta, jnp.bfloat16)
    env = NifEnv(params=params)
    blocks = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1024, 2048, 4096, 8192]
    work = to_device_batch(make_worklist(WIDTH, HEIGHT))
    settings = RenderSettings.make(samples_per_step=LOOP)
    cols = work.u.astype(jnp.float32)
    rows = work.v.astype(jnp.float32)

    for bs in blocks:
        def step(i, bs=bs):
            out = render_megastep_pallas.__wrapped__(
                scene, settings, env.params, cols, rows,
                jnp.asarray([i, i + 3], jnp.int32),
                width=WIDTH, height=HEIGHT, max_path_length=10, block_size=bs,
            )
            return out.radiance.x[0]

        f = jax.jit(step)
        try:
            float(f(0))
        except Exception as e:
            print(f"block={bs}: FAIL {str(e)[:120]}")
            continue
        t0 = time.monotonic()
        for i in range(REPS):
            float(f(i))
        dt = (time.monotonic() - t0) / (REPS * LOOP)
        print(f"block={bs:5d}: {dt*1e3:8.2f} ms/sample ({WIDTH*HEIGHT/dt/1e6:6.1f} Mpaths/s)")


if __name__ == "__main__":
    main()
