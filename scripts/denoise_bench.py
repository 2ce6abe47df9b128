"""Measure --denoise's preview-quality win on the TPU.

Protocol (one real chip, trained NIF env, reference tone map):

  1. Ground truth per scene: a uniform render at GT_SPP samples/pixel.
  2. Render a preview curve (PREVIEW_SPP checkpoints) and at each
     checkpoint record the tone-mapped RMSE of (a) the raw film and
     (b) the film filtered by film/denoise.py, against the tone-mapped
     ground truth.
  3. The headline is the equal-quality sample multiplier: how much
     further the RAW curve must run to match the denoised RMSE at each
     checkpoint (interpolated on the measured raw curve in log-log).

The metric is TONE-MAPPED (exposure 0, gamma 2.2, the reference's save
math - film/film.py tone_map) because the denoiser targets displayed
previews; linear-HDR RMSE is dominated by the handful of caustic
fireflies whose energy the edge-stop correctly refuses to smear.

Scenes: the default scene (near-converged at low spp - the honest
neutral case) and assets/scenes/glass_caustic.json (the noisy preview
case the feature exists for).

Writes docs/DENOISE.json.  Usage:
  python scripts/denoise_bench.py [assets_dir]
  DB_W/DB_H/DB_GT_SPP env vars override the frame / ground-truth size.
"""

from __future__ import annotations

import json
import math
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
from ipu_path_trace_tpu.core.scenefile import load_scene
from ipu_path_trace_tpu.film.denoise import denoise_hdr, primary_features
from ipu_path_trace_tpu.film.film import Film, tone_map
from ipu_path_trace_tpu.models.envlight import NifEnv
from ipu_path_trace_tpu.models.nif import load_nif_assets
from ipu_path_trace_tpu.render.params import RenderSettings, StaticConfig
from ipu_path_trace_tpu.render.wavefront import make_base_key, render_step

W = int(os.environ.get("DB_W", 1104))
H = int(os.environ.get("DB_H", 1000))
GT_SPP = int(os.environ.get("DB_GT_SPP", 16384))
PREVIEW_SPP = (8, 32, 128, 512)
SIGMAS = (0.5, 1.0, 2.0)  # log-luminance edge-stop sweep (default 1.0)
FOV = 90.0


def film_of(work, mask=None) -> np.ndarray:
    wb = jax.tree.map(np.asarray, work)
    film = Film(W, H)
    film.accumulate_soa(wb.u, wb.v, wb.r, wb.g, wb.b, wb.sample_count)
    return film.hdr_at_step(1)


def ldr_rmse(a_hdr, b_ldr):
    la = tone_map(a_hdr, 1, 0.0, 2.2).astype(np.float32) / 255.0
    return float(np.sqrt(np.mean((la - b_ldr) ** 2)))


def run_scene(name: str, scene, env) -> dict:
    cfg = StaticConfig(width=W, height=H)
    sync = jax.jit(lambda w: w.r[0] + w.b[-1])
    wl = make_worklist(W, H)

    # --- ground truth ---
    t0 = time.monotonic()
    gt_settings = RenderSettings.make(samples_per_step=512)
    work = to_device_batch(wl)
    key = make_base_key(101)
    for s in range(GT_SPP // 512):
        work = render_step(scene, gt_settings, cfg, work,
                           jax.random.fold_in(key, s), env)
    float(sync(work))
    gt_ldr = tone_map(film_of(work), 1, 0.0, 2.2).astype(np.float32) / 255.0
    print(f"[{name}] ground truth {GT_SPP} spp in "
          f"{time.monotonic() - t0:.0f}s", file=sys.stderr)

    guides = primary_features(scene, W, H, math.radians(FOV), env=env)

    # --- preview curve ---
    work = to_device_batch(wl)
    base = make_base_key(7)
    spp_done = 0
    raw_pts, dn_pts = [], []
    dn_seconds = None
    for target in PREVIEW_SPP:
        while spp_done < target:
            step_spp = min(512, target - spp_done)
            settings = RenderSettings.make(samples_per_step=step_spp)
            work = render_step(scene, settings, cfg, work,
                               jax.random.fold_in(base, spp_done), env)
            spp_done += step_spp
        float(sync(work))
        hdr = film_of(work)
        raw = ldr_rmse(hdr, gt_ldr)
        raw_pts.append({"spp": target, "ldr_rmse": raw})
        entry = {"spp": target, "raw_ldr_rmse": raw}
        for sig in SIGMAS:
            t0 = time.monotonic()
            dn = denoise_hdr(hdr, guides, sigma_colour=sig)
            dn_seconds = time.monotonic() - t0
            entry[f"denoised_ldr_rmse_sigma{sig}"] = ldr_rmse(dn, gt_ldr)
        dn_pts.append(entry)
        print(f"[{name}] {target:4d} spp: raw {raw:.4f}  "
              + "  ".join(f"s{par}={entry[f'denoised_ldr_rmse_sigma{par}']:.4f}"
                          for par in SIGMAS),
              file=sys.stderr)

    # Bounded equal-quality claim, NO extrapolation: the deepest
    # MEASURED raw checkpoint the denoised image still beats.  (The raw
    # tone-mapped curve converges only ~n^-0.23 - gamma amplifies
    # dark-region shot noise - so a fitted "equal-quality spp" explodes
    # into the thousands; we refuse to headline an extrapolation.)
    for entry in dn_pts:
        best = min(entry[f"denoised_ldr_rmse_sigma{s}"] for s in SIGMAS)
        beaten = [p["spp"] for p in raw_pts if p["ldr_rmse"] > best]
        entry["beats_measured_raw_spp"] = max(beaten) if beaten else 0
        if beaten:
            entry["sample_multiplier_lower_bound"] = round(
                max(beaten) / entry["spp"], 1)

    return {
        "raw": raw_pts,
        "denoised": dn_pts,
        "filter_seconds_per_frame_host": round(dn_seconds, 3),
    }


def main() -> None:
    assets = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "assets", "nif_w192e16")
    params, _, _ = load_nif_assets(assets, jnp.bfloat16)
    env = NifEnv(params=params)
    print(f"device: {jax.devices()[0]}, frame {W}x{H}, assets {assets}",
          file=sys.stderr)
    _ = float(jnp.sum(jnp.arange(8.0)))  # tunnel warmup

    result = {
        "frame": [W, H], "assets": os.path.basename(assets),
        "gt_spp": GT_SPP, "sigmas": list(SIGMAS),
        "metric": "rmse of (x*2^0)^(1/2.2) tone-mapped images vs the "
                  "tone-mapped ground truth (displayed-preview quality)",
        "scenes": {},
    }
    result["scenes"]["default"] = run_scene("default", default_scene(), env)
    result["scenes"]["glass_caustic"] = run_scene(
        "glass_caustic",
        load_scene(os.path.join(REPO, "assets", "scenes", "glass_caustic.json")),
        env)

    out = os.path.join(REPO, "docs", "DENOISE.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    summary = {
        s: [{"spp": e["spp"],
             "beats_raw_spp": e.get("beats_measured_raw_spp"),
             "mult_lower_bound": e.get("sample_multiplier_lower_bound")}
            for e in result["scenes"][s]["denoised"]]
        for s in result["scenes"]
    }
    print(json.dumps({"equal_quality_bounds": summary, "written": out}))


if __name__ == "__main__":
    main()
