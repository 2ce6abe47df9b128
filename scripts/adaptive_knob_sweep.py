"""Sweep the adaptive sampler's floor/cap knobs on the TPU.

For each (adaptive_min, adaptive_max_factor): render the canonical
frame to 1024 spp-equivalent with the adaptive controller and score the
RMSE against a fixed uniform ground truth; sample efficiency is
(rmse_uniform / rmse_adaptive)^2 at the same total.  Settles the
shipped defaults by measurement (docs/ADAPTIVE.json "knob_sweep").

Usage: python scripts/adaptive_knob_sweep.py [assets_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ipu_path_trace_tpu.core.records import make_worklist, to_device_batch
from ipu_path_trace_tpu.core.scene import default_scene
from ipu_path_trace_tpu.models.envlight import NifEnv
from ipu_path_trace_tpu.models.nif import load_nif_assets
from ipu_path_trace_tpu.render.adaptive import adaptive_render_step
from ipu_path_trace_tpu.render.params import RenderSettings, StaticConfig
from ipu_path_trace_tpu.render.wavefront import make_base_key, render_step
from ipu_path_trace_tpu.runtime.worklist import coherent_order

W, H = 1104, 1000
SPP_STEP = 128
STEPS = 8  # 1024 spp-equivalent
GT_SPP = int(os.environ.get("AK_GT_SPP", 16384))
KNOBS = [  # (adaptive_min, adaptive_max_factor)
    (8, 16.0),  # shipped defaults (the knee; see docs/ADAPTIVE.json)
    (8, 2.0), (8, 4.0), (8, 8.0), (8, 32.0),
    (2, 4.0), (32, 4.0),
    (2, 16.0),
]


def main() -> None:
    assets = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "assets", "nif_w192e16")
    params, _, _ = load_nif_assets(assets, jnp.bfloat16)
    env = NifEnv(params=params)
    scene = default_scene()
    settings = RenderSettings.make(samples_per_step=SPP_STEP)
    gt_settings = RenderSettings.make(samples_per_step=512)
    wl = coherent_order(make_worklist(W, H), scene, W, H, 90.0)
    mask = wl["u"] != np.uint16(0xFFFF)
    sync = jax.jit(lambda w: w.r[0] + w.b[-1])
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    _ = float(jnp.sum(jnp.arange(8.0)))

    def mean_rgb(work):
        wb = jax.tree.map(np.asarray, work)
        cnt = np.maximum(wb.sample_count, 1).astype(np.float64)
        return (np.stack([wb.r, wb.g, wb.b]) / cnt)[:, mask]

    cfg0 = StaticConfig(width=W, height=H)
    work = to_device_batch(wl)
    key = make_base_key(101)
    t0 = time.monotonic()
    for s in range(GT_SPP // 512):
        work = render_step(scene, gt_settings, cfg0, work,
                           jax.random.fold_in(key, s), env)
    float(sync(work))
    gt = mean_rgb(work)
    print(f"ground truth {GT_SPP} spp in {time.monotonic() - t0:.0f}s",
          file=sys.stderr)

    def rmse_of(m):
        return float(np.sqrt(np.mean((m - gt) ** 2)))

    # Uniform score at the same total (the efficiency denominator):
    work = to_device_batch(wl)
    base = make_base_key(7)
    for step in range(1, STEPS + 1):
        work = render_step(scene, settings, cfg0, work,
                           jax.random.fold_in(base, step), env)
    float(sync(work))
    rmse_u = rmse_of(mean_rgb(work))
    print(f"[uniform] {STEPS * SPP_STEP} spp: rmse {rmse_u:.3e}",
          file=sys.stderr)

    rows = []
    for mn, capf in KNOBS:
        cfg = StaticConfig(width=W, height=H, adaptive_min=mn,
                           adaptive_max_factor=capf)
        work = to_device_batch(wl)
        lum2 = jnp.zeros(work.u.shape[0], jnp.float32)
        t0 = time.monotonic()
        for step in range(1, STEPS + 1):
            work, lum2 = adaptive_render_step(
                scene, settings, cfg, work, lum2,
                jax.random.fold_in(base, step), env)
        float(sync(work))
        secs = time.monotonic() - t0  # includes this config's compile
        r = rmse_of(mean_rgb(work))
        rows.append({"min": mn, "max_factor": capf, "rmse": r,
                     "sample_efficiency": round((rmse_u / r) ** 2, 3),
                     "seconds_incl_compile": round(secs, 1)})
        print(f"[min={mn:3d} cap={capf:4.1f}] rmse {r:.3e} "
              f"eff {(rmse_u / r) ** 2:5.2f}x", file=sys.stderr)

    path = os.path.join(REPO, "docs", "ADAPTIVE.json")
    doc = json.load(open(path))
    doc["knob_sweep"] = {"total_spp": STEPS * SPP_STEP, "uniform_rmse": rmse_u,
                         "rows": rows}
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps(doc["knob_sweep"]))


if __name__ == "__main__":
    main()
