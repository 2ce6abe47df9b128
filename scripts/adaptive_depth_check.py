"""Verify the adaptive sampler's efficiency holds at PRODUCTION depth.

adaptive_bench.py establishes ~3x sample efficiency up to 2048 spp
against a fixed ground truth.  This check extends to tens of thousands
of spp without needing an (expensive) even-deeper ground truth, using
the two-seed identity for unbiased estimators:

    E[RMSE(uniA, uniB)^2]  = 2 * noise_u^2
    E[RMSE(ada,  uniA)^2]  = noise_a^2 + noise_u^2

so  noise_a <= noise_u  <=>  RMSE(ada, uni) <= RMSE(uniA, uniB).

Renders uniform at N spp twice (independent seeds) and adaptive ONCE at
N / claimed-speedup spp; if the adaptive image is no noisier than the
uniform pair's mutual distance, the claimed time-to-quality speedup
holds at this depth.  Appends the result to docs/ADAPTIVE.json.

Usage: python scripts/adaptive_depth_check.py [assets_dir]
       AD_N (uniform spp, default 20480), AD_SPEEDUP (default 2.55).
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
N_UNI = int(os.environ.get("AD_N", 20480))
SPEEDUP = float(os.environ.get("AD_SPEEDUP", 2.55))


def main() -> None:
    assets = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "assets", "nif_w192e16")
    params, _, _ = load_nif_assets(assets, jnp.bfloat16)
    env = NifEnv(params=params)
    scene = default_scene()
    cfg = StaticConfig(width=W, height=H)
    settings = RenderSettings.make(samples_per_step=SPP_STEP)
    wl = coherent_order(make_worklist(W, H), scene, W, H, 90.0)
    mask = wl["u"] != np.uint16(0xFFFF)
    sync = jax.jit(lambda w: w.r[0] + w.b[-1])
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    _ = float(jnp.sum(jnp.arange(8.0)))

    def mean_rgb(work):
        wb = jax.tree.map(np.asarray, work)
        cnt = np.maximum(wb.sample_count, 1).astype(np.float64)
        return (np.stack([wb.r, wb.g, wb.b]) / cnt)[:, mask]

    def render(seed: int, steps: int, adaptive: bool):
        base = make_base_key(seed)
        work = to_device_batch(wl)
        lum2 = jnp.zeros(work.u.shape[0], jnp.float32)
        t0 = time.monotonic()
        for step in range(1, steps + 1):
            k = jax.random.fold_in(base, step)
            if adaptive:
                work, lum2 = adaptive_render_step(
                    scene, settings, cfg, work, lum2, k, env)
            else:
                work = render_step(scene, settings, cfg, work, k, env)
        float(sync(work))
        secs = time.monotonic() - t0
        label = "adaptive" if adaptive else "uniform"
        print(f"[{label} seed {seed}] {steps * SPP_STEP} spp in {secs:.0f}s",
              file=sys.stderr)
        return mean_rgb(work), secs

    steps_u = N_UNI // SPP_STEP
    steps_a = max(1, round(N_UNI / SPEEDUP / SPP_STEP))
    uni_a, t_ua = render(11, steps_u, False)
    uni_b, t_ub = render(22, steps_u, False)
    ada, t_a = render(33, steps_a, True)

    def rmse(x, y):
        return float(np.sqrt(np.mean((x - y) ** 2)))

    uu = rmse(uni_a, uni_b)
    au = rmse(ada, uni_a)
    ab = rmse(ada, uni_b)
    # Pooled estimators (each single RMSE is one noisy realization):
    #   noise_u^2 = uu^2 / 2
    #   noise_a^2 = mean(au^2, ab^2) - noise_u^2
    noise_u2 = uu * uu / 2.0
    noise_a2 = max((au * au + ab * ab) / 2.0 - noise_u2, 0.0)
    ratio = float(np.sqrt(noise_a2 / max(noise_u2, 1e-30)))
    holds = bool(ratio <= 1.0)
    entry = {
        "uniform_spp": steps_u * SPP_STEP,
        "adaptive_spp": steps_a * SPP_STEP,
        "claimed_speedup": SPEEDUP,
        "rmse_uniA_uniB": uu,
        "rmse_ada_uniA": au,
        "rmse_ada_uniB": ab,
        "noise_ratio_a_over_u": round(ratio, 3),
        "seconds": {"uniform": round((t_ua + t_ub) / 2, 1),
                    "adaptive": round(t_a, 1)},
        "holds": holds,
    }
    path = os.path.join(REPO, "docs", "ADAPTIVE.json")
    doc = json.load(open(path))
    doc["depth_check"] = entry
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps(entry))


if __name__ == "__main__":
    main()
