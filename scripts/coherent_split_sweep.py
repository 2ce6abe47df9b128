"""Sweep early-out split point x block size UNDER the coherent layout.

With primary-hit-sorted (homogeneous) blocks the optimal early-out
split may shift: diffuse-floor blocks die at bounce 2, but the default
split (4 for L=10) forces them through bounce 3.  Smaller blocks also
increase homogeneity.  Companion to scripts/coherent_layout_probe.py.
"""
import os
import sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import numpy as np
import jax, jax.numpy as jnp
from ipu_path_trace_tpu.ops.megastep_pallas import render_megastep_pallas
from ipu_path_trace_tpu.core.records import make_worklist, to_device_batch
from ipu_path_trace_tpu.core.scene import default_scene
from ipu_path_trace_tpu.models.envlight import NifEnv
from ipu_path_trace_tpu.models.nif import load_nif_assets
from ipu_path_trace_tpu.render.params import RenderSettings
from coherent_layout_probe import primary_hit_key

W, H, LOOP, REPS = 1104, 1000, 300, 3
scene = default_scene()
params, _, _ = load_nif_assets(os.path.join(REPO, "assets", "nif_w192e16"),
                               jnp.bfloat16)
env = NifEnv(params=params)
settings = RenderSettings.make(samples_per_step=LOOP)

wl = make_worklist(W, H)
key = primary_hit_key(scene, wl["u"], wl["v"], 90.0)
perm = np.lexsort((np.arange(len(wl)), key))
work = to_device_batch(wl[perm])
cols = work.u.astype(jnp.float32)
rows = work.v.astype(jnp.float32)

_ = float(jnp.sum(jnp.arange(8.0)))  # tunnel warmup

for block, split in [(2048, 2), (2048, 3), (2048, 4), (2048, 6),
                     (1024, 2), (1024, 3), (4096, 3)]:
    def step(i, split=split, block=block):
        out = render_megastep_pallas(
            scene, settings, env.params, cols, rows,
            jnp.asarray([i, i + 3], jnp.int32),
            width=W, height=H, max_path_length=10, block_size=block,
            split_point=split)
        return float(out.radiance.x[0])
    step(split * 1000 + block)  # compile
    t0 = time.monotonic()
    for i in range(REPS):
        step(i)
    dt = (time.monotonic() - t0) / (REPS * LOOP)
    print(f"block={block} split={split}: {dt*1e3:6.2f} ms/sample "
          f"({W*H/dt/1e6:6.1f} Mpaths/s)", flush=True)
