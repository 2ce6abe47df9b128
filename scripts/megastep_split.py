"""In-kernel split of the fused megastep: stub out the NIF or the trace.

Monkeypatches megastep_pallas.nif_layer / bounce_once with cheap stubs
to see where the fused kernel's time actually goes and whether the
VPU/MXU interleave is overlapping.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

WIDTH, HEIGHT = 1104, 1000
LOOP = 300
REPS = 2

from ipu_path_trace_tpu.ops import megastep_pallas as mp  # noqa: E402

real_nif_layer = mp.nif_layer
real_bounce = mp.bounce_once


def stub_nif_layer(x, feats, w_ref, b_ref, is_last, upcast=False):
    out_dim = w_ref.shape[0]
    return (x[:1] * 0.0 + 1.0).repeat(out_dim, axis=0).astype(
        jnp.float32 if is_last else x.dtype
    )


def stub_bounce(sph_ref, dsc_ref, num_s, num_d, st, rr, u1, u2, fr, b,
                refr, stop, roul):
    # Keep the carry structure but do ~no work:
    return st._replace(path_len=st.path_len + 1)


def run(name, nif_stub: bool, trace_stub: bool):
    from ipu_path_trace_tpu.core.records import make_worklist, to_device_batch
    from ipu_path_trace_tpu.core.scene import default_scene
    from ipu_path_trace_tpu.models.envlight import NifEnv
    from ipu_path_trace_tpu.models.nif import make_params, make_synthetic_nif
    from ipu_path_trace_tpu.render.params import RenderSettings

    mp.nif_layer = stub_nif_layer if nif_stub else real_nif_layer
    mp.bounce_once = stub_bounce if trace_stub else real_bounce

    scene = default_scene()
    weights, meta = make_synthetic_nif(key=0)
    env = NifEnv(params=make_params(weights, meta, jnp.bfloat16))
    work = to_device_batch(make_worklist(WIDTH, HEIGHT))
    settings = RenderSettings.make(samples_per_step=LOOP)
    cols = work.u.astype(jnp.float32)
    rows = work.v.astype(jnp.float32)

    def step(i):
        out = mp.render_megastep_pallas.__wrapped__(
            scene, settings, env.params, cols, rows,
            jnp.asarray([i, i + 3], jnp.int32),
            width=WIDTH, height=HEIGHT, max_path_length=10,
        )
        return out.radiance.x[0]

    f = jax.jit(step)
    float(f(0))
    t0 = time.monotonic()
    for i in range(REPS):
        float(f(i))
    dt = (time.monotonic() - t0) / (REPS * LOOP)
    print(f"{name:12s} {dt*1e3:8.2f} ms/sample ({WIDTH*HEIGHT/dt/1e6:6.1f} Mpaths/s)")


run("full", False, False)
run("nif-only", False, True)
run("trace-only", True, False)
run("neither", True, True)
