"""Measure the dead-block env-skip (megastep_pallas._env_contrib).

The skip elides the whole NIF matmul chain for a (block, sample)
iteration when every lane's escape weight is zero - the MXU analog of
the trace's dead-block early-out.  The reference always pays the full
batch (codelets.cpp:348-352), so any win here beats its design; but the
win is scene-dependent: the skip can only fire when an entire
2048-lane block escapes nothing in a sample.

Two measurements per scene (default + the shipped geometry-heavy
scenes, coherent worklist order as the app uses):

  1. escape stats (XLA path, exact): per-lane escape fraction and the
     fraction of (block, sample) iterations whose total escape weight
     is zero - i.e. how often the skip CAN fire.
  2. megastep rate (TPU): ms/sample with env_skip on vs off at the
     canonical 1104x1000 / 300 spp shape.

Writes docs/ENVSKIP.json.  Run with the TPU attached:
    python scripts/envskip_bench.py [--samples 8] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ipu_path_trace_tpu.core.records import make_worklist, to_device_batch
from ipu_path_trace_tpu.core.scene import default_scene
from ipu_path_trace_tpu.core.scenefile import load_scene
from ipu_path_trace_tpu.models.envlight import NifEnv
from ipu_path_trace_tpu.models.nif import make_params, make_synthetic_nif
from ipu_path_trace_tpu.ops.megastep_pallas import render_megastep_pallas
from ipu_path_trace_tpu.render.params import RenderSettings, StaticConfig
from ipu_path_trace_tpu.render.wavefront import (
    make_base_key, sample_key, sample_noise, trace_sample_with_uniforms,
)
from ipu_path_trace_tpu.runtime.worklist import coherent_order

W, H, SPP = 1104, 1000, 300
BLOCK = 2048

SCENES = {
    "default": None,
    "mirror_hall": "assets/scenes/mirror_hall.json",
    "glass_caustic": "assets/scenes/glass_caustic.json",
    # Fully-enclosed synthetic: the default 5-sphere layout inside a
    # giant diffuse shell - NO path ever escapes, so every (block,
    # sample) is dead and the skip elides the whole NIF chain.  This
    # bounds the win the mechanism can deliver for interior scenes:
    "enclosed": "__enclosed__",
}

_ENCLOSED = {"objects": [
    {"type": "sphere", "center": [0.0, 0.0, 0.0], "radius": 200.0,
     "colour": [0.6, 0.6, 0.6], "material": "diffuse",
     "emission": [0.8, 0.8, 0.8]},
    {"type": "sphere", "center": [-0.75, -0.49, -3.25], "radius": 0.51,
     "colour": [0.9, 0.2, 0.2], "material": "diffuse"},
    {"type": "sphere", "center": [0.75, -0.49, -3.25], "radius": 0.51,
     "colour": [0.2, 0.9, 0.2], "material": "specular"},
    {"type": "sphere", "center": [0.0, -0.6, -2.3], "radius": 0.4,
     "colour": [0.9, 0.9, 0.9], "material": "refractive"},
    {"type": "disc", "normal": [0.0, 1.0, 0.0],
     "center": [0.0, -1.0, -3.0], "radius": 4.0,
     "colour": [0.7, 0.7, 0.7], "material": "diffuse"},
]}


def escape_stats(scene, cfg, settings, cols, rows, n_samples: int):
    """Exact per-lane / per-block escape statistics via the XLA twin."""
    n = cols.shape[0]
    nblk = -(-n // BLOCK)  # the kernel pads the tail block with dead lanes
    base = make_base_key(42)

    @jax.jit
    def one(skey):
        noise = sample_noise(skey, n, cfg, None, None)
        st = trace_sample_with_uniforms(
            scene, settings, cfg, cols, rows, noise[0:2], noise[2:4],
            noise[4:].reshape(cfg.max_path_length, 4, n))
        w = st.esc_w.x + st.esc_w.y + st.esc_w.z  # throughputs, >= 0
        w = jnp.pad(w, (0, nblk * BLOCK - n))  # pad lanes escape nothing
        blk = w.reshape(nblk, BLOCK).sum(axis=1)
        return jnp.mean(st.escaped.astype(jnp.float32)), jnp.mean(blk == 0.0)

    esc, dead = 0.0, 0.0
    for i in range(n_samples):
        e, d = one(sample_key(base, i))
        esc += float(e)
        dead += float(d)
    return esc / n_samples, dead / n_samples


def bench(scene, settings, env, cols, rows, env_skip: bool, reps: int):
    """ms/sample of the fused megastep (TPU)."""
    def step(i):
        out = render_megastep_pallas(
            scene, settings, env.params, cols, rows,
            jnp.asarray([i, i + 3], jnp.int32),
            width=W, height=H, max_path_length=10, block_size=BLOCK,
            env_skip=env_skip)
        return float(out.radiance.x[0])  # scalar fetch = reliable barrier

    step(9999)  # compile
    t0 = time.monotonic()
    for i in range(reps):
        step(i)
    return (time.monotonic() - t0) / (reps * SPP) * 1e3


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=8,
                    help="samples for the exact escape statistics")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--stats-only", action="store_true",
                    help="skip the TPU timing (runs on any backend)")
    args = ap.parse_args()

    weights, meta = make_synthetic_nif(key=0)  # canonical 6x320 arch
    env = NifEnv(params=make_params(weights, meta, jnp.bfloat16))
    cfg = StaticConfig(width=W, height=H)
    settings = RenderSettings.make(samples_per_step=SPP)

    on_tpu = jax.devices()[0].platform == "tpu"
    out = {"shape": f"{W}x{H}", "spp": SPP, "block": BLOCK, "scenes": {}}
    for name, path in SCENES.items():
        if path is None:
            scene = default_scene()
        elif path == "__enclosed__":
            from ipu_path_trace_tpu.core.scenefile import scene_from_dict

            scene = scene_from_dict(_ENCLOSED)
        else:
            scene = load_scene(os.path.join(REPO, path))
        wl = coherent_order(make_worklist(W, H), scene, W, H, 90.0)
        work = to_device_batch(wl)
        cols = work.u.astype(jnp.float32)
        rows = work.v.astype(jnp.float32)

        esc, dead = escape_stats(scene, cfg, settings, cols, rows,
                                 args.samples)
        row = {"escape_fraction": round(esc, 4),
               "dead_block_fraction": round(dead, 4)}
        if on_tpu and not args.stats_only:
            ms_on = bench(scene, settings, env, cols, rows, True, args.reps)
            ms_off = bench(scene, settings, env, cols, rows, False, args.reps)
            row.update(ms_per_sample_skip_on=round(ms_on, 3),
                       ms_per_sample_skip_off=round(ms_off, 3),
                       speedup=round(ms_off / ms_on, 4))
        out["scenes"][name] = row
        print(f"{name}: {json.dumps(row)}", flush=True)

    with open(os.path.join(REPO, "docs", "ENVSKIP.json"), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
