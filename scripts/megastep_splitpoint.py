"""Sweep the early-out split point of the megastep at 300 spp."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from ipu_path_trace_tpu.ops import megastep_pallas as mp
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
cols = work.u.astype(jnp.float32); rows = work.v.astype(jnp.float32)

import ipu_path_trace_tpu.ops.megastep_pallas as M
src_kernel = M._kernel

for split in (2, 3, 4, 6):
    # monkeypatch by rebinding the module-level formula via a wrapper:
    import functools
    def patched_kernel(*a, _split=split, **k):
        import ipu_path_trace_tpu.ops.megastep_pallas as mm
        old = mm.__dict__.get("_SPLIT_OVERRIDE")
        mm._SPLIT_OVERRIDE = _split
        try:
            return src_kernel(*a, **k)
        finally:
            mm._SPLIT_OVERRIDE = old
    M._kernel = patched_kernel
    def step(i):
        out = mp.render_megastep_pallas.__wrapped__(
            scene, settings, env.params, cols, rows,
            jnp.asarray([i, i + 3], jnp.int32),
            width=W, height=H, max_path_length=10, block_size=2048)
        return out.radiance.x[0]
    f = jax.jit(step)
    float(f(split * 1000))
    t0 = time.monotonic()
    for i in range(REPS): float(f(i))
    dt = (time.monotonic()-t0)/(REPS*LOOP)
    print(f"split={split}: {dt*1e3:6.2f} ms/sample ({W*H/dt/1e6:6.1f} Mpaths/s)", flush=True)
