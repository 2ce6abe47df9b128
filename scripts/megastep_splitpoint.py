"""Sweep the early-out split point of the megastep at 300 spp.

Measured (v5e, 1104x1000, block 2048): splits 3/4/6 are equivalent at
~8.9 ms/sample; split 2 is ~1% worse. The default formula
(1 + (L-1)//3 = 4 for L=10) stands.
"""
import os
import sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp
from ipu_path_trace_tpu.ops.megastep_pallas import render_megastep_pallas
from ipu_path_trace_tpu.core.records import make_worklist, to_device_batch
from ipu_path_trace_tpu.core.scene import default_scene
from ipu_path_trace_tpu.models.envlight import NifEnv
from ipu_path_trace_tpu.models.nif import make_params, make_synthetic_nif
from ipu_path_trace_tpu.render.params import RenderSettings

W, H, LOOP, REPS = 1104, 1000, 300, 2
scene = default_scene()
weights, meta = make_synthetic_nif(key=0)
env = NifEnv(params=make_params(weights, meta, jnp.bfloat16))
work = to_device_batch(make_worklist(W, H))
settings = RenderSettings.make(samples_per_step=LOOP)
cols = work.u.astype(jnp.float32)
rows = work.v.astype(jnp.float32)

for split in (2, 3, 4, 6):
    def step(i, split=split):
        out = render_megastep_pallas(
            scene, settings, env.params, cols, rows,
            jnp.asarray([i, i + 3], jnp.int32),
            width=W, height=H, max_path_length=10, block_size=2048,
            split_point=split)
        return float(out.radiance.x[0])
    step(split * 1000)  # compile
    t0 = time.monotonic()
    for i in range(REPS):
        step(i)
    dt = (time.monotonic() - t0) / (REPS * LOOP)
    print(f"split={split}: {dt*1e3:6.2f} ms/sample ({W*H/dt/1e6:6.1f} Mpaths/s)",
          flush=True)
