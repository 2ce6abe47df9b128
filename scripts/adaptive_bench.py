"""Measure the adaptive sampler's equal-cost quality win on the TPU.

Protocol (one real chip, canonical 1104x1000 frame, trained NIF env):

  1. Ground truth: a uniform render at GT_SPP samples/pixel.
  2. Render the frame twice at EQUAL per-step sample totals - once with
     the uniform sampler (render_step), once with --adaptive's
     controller (adaptive_render_step) - and record the RMSE of the
     running per-pixel mean against the ground truth at checkpoint
     sample totals, plus wall time per curve.

Since both samplers run the identical fused megastep at the identical
total sample count, any RMSE gap at a checkpoint is pure allocation
win; the "sample efficiency" is the factor by which the uniform curve
must run longer to match the adaptive RMSE (RMSE ~ 1/sqrt(n) =>
efficiency ~ (rmse_u / rmse_a)^2).

Writes docs/ADAPTIVE.json and prints a summary table.

Usage: python scripts/adaptive_bench.py [assets_dir]
       AB_W/AB_H/AB_GT_SPP env vars override the frame/GT size.
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
from ipu_path_trace_tpu.render.adaptive import (
    TPU_BLOCK,
    adaptive_render_step,
    compute_budgets,
)
from ipu_path_trace_tpu.render.params import RenderSettings, StaticConfig
from ipu_path_trace_tpu.render.wavefront import make_base_key, render_step
from ipu_path_trace_tpu.runtime.worklist import coherent_order

W = int(os.environ.get("AB_W", 1104))
H = int(os.environ.get("AB_H", 1000))
GT_SPP = int(os.environ.get("AB_GT_SPP", 16384))
SPP_STEP = 128
CHECK_STEPS = (1, 2, 4, 8, 16)  # totals 128 .. 2048 spp-equivalent


def _mean_rgb(wb, mask):
    cnt = np.maximum(np.asarray(wb.sample_count), 1).astype(np.float64)
    m = np.stack([np.asarray(wb.r), np.asarray(wb.g), np.asarray(wb.b)])
    return (m / cnt)[:, mask]


def main() -> None:
    assets = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "assets", "nif_w192e16")
    params, _, _ = load_nif_assets(assets, jnp.bfloat16)
    env = NifEnv(params=params)
    scene = default_scene()
    cfg = StaticConfig(width=W, height=H)
    print(f"device: {jax.devices()[0]}, frame {W}x{H}, assets {assets}",
          file=sys.stderr)
    _ = float(jnp.sum(jnp.arange(8.0)))  # tunnel warmup

    wl = coherent_order(make_worklist(W, H), scene, W, H, 90.0)
    mask = wl["u"] != np.uint16(0xFFFF)
    sync = jax.jit(lambda w: w.r[0] + w.b[-1])

    # --- ground truth ---
    t0 = time.monotonic()
    gt_settings = RenderSettings.make(samples_per_step=512)
    work = to_device_batch(wl)
    key = make_base_key(101)
    for s in range(GT_SPP // 512):
        work = render_step(scene, gt_settings, cfg, work,
                           jax.random.fold_in(key, s), env)
    float(sync(work))
    gt = _mean_rgb(jax.tree.map(np.asarray, work), mask)
    print(f"ground truth {GT_SPP} spp in {time.monotonic() - t0:.0f}s",
          file=sys.stderr)

    settings = RenderSettings.make(samples_per_step=SPP_STEP)

    def rmse(wb):
        return float(np.sqrt(np.mean((_mean_rgb(wb, mask) - gt) ** 2)))

    def run_curve(adaptive: bool):
        # Warm the jit outside the timed window (the uniform step is
        # already warm from the GT loop; give adaptive the same start):
        w0 = to_device_batch(wl)
        l0 = jnp.zeros(w0.u.shape[0], jnp.float32)
        if adaptive:
            w0, l0 = adaptive_render_step(
                scene, settings, cfg, w0, l0, make_base_key(999), env)
        else:
            w0 = render_step(scene, settings, cfg, w0, make_base_key(999), env)
        float(sync(w0))

        work = to_device_batch(wl)
        lum2 = jnp.zeros(work.u.shape[0], jnp.float32)
        base = make_base_key(7)
        pts, spent = [], 0.0
        step = 0
        for ck in CHECK_STEPS:
            t0 = time.monotonic()
            while step < ck:
                step += 1
                k = jax.random.fold_in(base, step)
                if adaptive:
                    work, lum2 = adaptive_render_step(
                        scene, settings, cfg, work, lum2, k, env)
                else:
                    work = render_step(scene, settings, cfg, work, k, env)
            float(sync(work))
            spent += time.monotonic() - t0
            wb = jax.tree.map(np.asarray, work)
            pts.append({"total_spp": ck * SPP_STEP, "rmse": rmse(wb),
                        "seconds": round(spent, 3)})
            label = "adaptive" if adaptive else "uniform"
            print(f"[{label}] {ck * SPP_STEP:5d} spp-eq: rmse {pts[-1]['rmse']:.3e} "
                  f"({spent:.1f}s)", file=sys.stderr)
        return pts, work, lum2

    uni, _, _ = run_curve(False)
    ada, work_a, lum2_a = run_curve(True)

    # Where did the samples go?  Final budget distribution:
    buds = np.asarray(compute_budgets(
        work_a.r, work_a.g, work_a.b, lum2_a, work_a.sample_count,
        block_size=TPU_BLOCK, samples_per_step=SPP_STEP,
        min_spp=cfg.adaptive_min,
        max_spp=int(cfg.adaptive_max_factor * SPP_STEP)))
    counts = np.asarray(work_a.sample_count)[mask]

    effs = []
    for u, a in zip(uni, ada):
        effs.append(round((u["rmse"] / a["rmse"]) ** 2, 3))
    # Wall-clock time for the uniform sampler to reach the adaptive
    # curve's final RMSE, by the MC law rmse ~ c/sqrt(n) fitted at the
    # uniform curve's last point (a mild extrapolation):
    n_match = uni[-1]["total_spp"] * (uni[-1]["rmse"] / ada[-1]["rmse"]) ** 2
    t_match = uni[-1]["seconds"] * n_match / uni[-1]["total_spp"]
    time_eff = round(t_match / ada[-1]["seconds"], 2)
    result = {
        "frame": [W, H], "assets": os.path.basename(assets),
        "gt_spp": GT_SPP, "spp_per_step": SPP_STEP,
        "adaptive_min": cfg.adaptive_min,
        "adaptive_max_factor": cfg.adaptive_max_factor,
        "uniform": uni, "adaptive": ada,
        "sample_efficiency": effs,
        "time_to_quality_speedup": time_eff,
        "final_budgets": {
            "floor_fraction": float((buds == cfg.adaptive_min).mean()),
            "cap_fraction": float(
                (buds == int(cfg.adaptive_max_factor * SPP_STEP)).mean()),
            "mean": float(buds.mean()),
        },
        "final_counts": {"min": int(counts.min()), "max": int(counts.max()),
                         "mean": round(float(counts.mean()), 1)},
    }
    out = os.path.join(REPO, "docs", "ADAPTIVE.json")
    if os.path.exists(out):  # keep knob_sweep / depth_check sections
        prior = json.load(open(out))
        prior.update(result)
        result = prior
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({"sample_efficiency_at_checkpoints": effs,
                      "time_to_quality_speedup": time_eff,
                      "written": out}))


if __name__ == "__main__":
    main()
