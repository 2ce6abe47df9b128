"""Per-phase device timing at the canonical bench shape.

Times the two hot kernels (fused trace megakernel, fused NIF env-shade)
with the loop INSIDE one jitted program (separate host dispatches pay
~10 ms of tunnel latency each and swamp the device time).  The
cycle-counter analog of the reference's per-phase timing
(reference: src/PathTracerApp.cpp:438-462).
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
LOOP = 16
REPS = 3


def timeit(name, fn):
    float(fn())  # warmup/compile; scalar fetch = reliable barrier
    t0 = time.monotonic()
    for _ in range(REPS):
        float(fn())
    dt = (time.monotonic() - t0) / (REPS * LOOP)
    print(f"{name:28s} {dt*1e3:8.2f} ms/iter  ({WIDTH*HEIGHT/dt/1e6:7.1f} Mpaths/s)")
    return dt


def main():
    from ipu_path_trace_tpu.core.records import make_worklist, to_device_batch
    from ipu_path_trace_tpu.core.scene import default_scene
    from ipu_path_trace_tpu.models.envlight import NifEnv
    from ipu_path_trace_tpu.models.nif import make_params, make_synthetic_nif
    from ipu_path_trace_tpu.ops.nif_pallas import nif_env_shade_pallas
    from ipu_path_trace_tpu.ops.trace_pallas import trace_sample_pallas
    from ipu_path_trace_tpu.render.params import RenderSettings, StaticConfig
    from ipu_path_trace_tpu.render.wavefront import make_base_key, render_step

    print(f"device: {jax.devices()[0]}")
    scene = default_scene()
    weights, meta = make_synthetic_nif(key=0)
    env = NifEnv(params=make_params(weights, meta, jnp.bfloat16))
    cfg = StaticConfig(width=WIDTH, height=HEIGHT)
    work = to_device_batch(make_worklist(WIDTH, HEIGHT))
    cols = work.u.astype(jnp.float32)
    rows = work.v.astype(jnp.float32)
    settings = RenderSettings.make(samples_per_step=LOOP)

    @jax.jit
    def trace_loop(cols, rows):
        def body(i, acc):
            st = trace_sample_pallas(
                scene, settings, cols, rows, jnp.stack([i, i + 7]),
                width=WIDTH, height=HEIGHT, max_path_length=cfg.max_path_length,
            )
            return (acc[0] + st.radiance.x, acc[1] + st.esc_dir.x,
                    acc[2] + st.esc_w.x)
        z = jnp.zeros_like(cols)
        acc = jax.lax.fori_loop(0, LOOP, body, (z, z, z))
        return acc[0][0] + acc[1][1] + acc[2][2]

    # env-shade loop over fixed esc data (realistic: mostly-escaped dirs)
    st = trace_sample_pallas(
        scene, settings, cols, rows, jnp.asarray([1, 2], jnp.int32),
        width=WIDTH, height=HEIGHT, max_path_length=cfg.max_path_length,
    )
    esc_dir, esc_w = st.esc_dir, st.esc_w
    frac = float(jnp.mean(st.escaped.astype(jnp.float32)))
    print(f"escaped fraction at terminal: {frac:.3f}")

    @jax.jit
    def env_loop(esc_dir, esc_w):
        def body(i, acc):
            out = nif_env_shade_pallas(env.params, esc_dir, esc_w,
                                       settings.azimuth + 1e-6 * i)
            return acc + out.x
        acc = jax.lax.fori_loop(0, LOOP, body, jnp.zeros_like(esc_dir.x))
        return acc[0]

    @jax.jit
    def step_loop(work):
        st = RenderSettings.make(samples_per_step=LOOP)
        out = render_step.__wrapped__(scene, st, cfg, work, make_base_key(3), env)
        return out.r[0]

    t_tr = timeit("trace (in-jit loop)", lambda: trace_loop(cols, rows))
    t_env = timeit("env-shade (in-jit loop)", lambda: env_loop(esc_dir, esc_w))
    t_full = timeit(f"render_step spp={LOOP}", lambda: step_loop(work))
    print(f"split: trace={t_tr*1e3:.2f} env={t_env*1e3:.2f} "
          f"sum={(t_tr+t_env)*1e3:.2f} full={t_full*1e3:.2f} "
          f"glue={(t_full-t_tr-t_env)*1e3:.2f} ms/sample")


if __name__ == "__main__":
    main()
