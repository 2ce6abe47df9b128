"""Measure --sampler sobol on the TPU: RMSE-vs-spp, rate cost, parity.

Protocol (one real chip, canonical 1104x1000 frame, trained NIF env):

  1. Ground truth: a prng render at GT_SPP samples/pixel (independent
     streams from every compared curve).
  2. Equal-spp RMSE curves against it for {prng, sobol} x {uniform,
     adaptive} - same fused megastep, same totals, so any gap is pure
     sampler/allocation win.
  3. Kernel-rate cost of the in-kernel Owen-Sobol bit math at the bench
     config (300 spp/step).
  4. Hardware consistency: the in-kernel sobol generator vs the SAME
     kernel consuming host-precomputed sobol rows (render/qmc.py math),
     at a reduced frame.

Writes docs/SOBOL.json and prints a summary JSON line.

Usage: python scripts/sobol_bench.py [assets_dir]
       SB_W/SB_H/SB_GT_SPP env vars override the frame/GT size.
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

W = int(os.environ.get("SB_W", 1104))
H = int(os.environ.get("SB_H", 1000))
GT_SPP = int(os.environ.get("SB_GT_SPP", 16384))
SPP_STEP = 128
CHECK_STEPS = (1, 2, 4, 8, 16)


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
    cfgs = {
        "prng": StaticConfig(width=W, height=H),
        "sobol": StaticConfig(width=W, height=H, sampler="sobol"),
    }
    print(f"device: {jax.devices()[0]}, frame {W}x{H}, assets {assets}",
          file=sys.stderr)
    _ = float(jnp.sum(jnp.arange(8.0)))  # tunnel warmup

    wl = coherent_order(make_worklist(W, H), scene, W, H, 90.0)
    mask = wl["u"] != np.uint16(0xFFFF)
    sync = jax.jit(lambda w: w.r[0] + w.b[-1])

    # --- ground truth (prng streams, unrelated seed) ---
    t0 = time.monotonic()
    gt_settings = RenderSettings.make(samples_per_step=512, seed=101)
    work = to_device_batch(wl)
    key = make_base_key(101)
    for s in range(GT_SPP // 512):
        work = render_step(scene, gt_settings, cfgs["prng"], work,
                           jax.random.fold_in(key, s), env)
    float(sync(work))
    gt = _mean_rgb(jax.tree.map(np.asarray, work), mask)
    print(f"ground truth {GT_SPP} spp in {time.monotonic() - t0:.0f}s",
          file=sys.stderr)

    def rmse(wb):
        return float(np.sqrt(np.mean((_mean_rgb(wb, mask) - gt) ** 2)))

    def run_curve(sampler: str, adaptive: bool):
        cfg = cfgs[sampler]
        settings = RenderSettings.make(samples_per_step=SPP_STEP, seed=7)
        # Warm the jit outside the timed window:
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
        pts, spent, step = [], 0.0, 0
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
            label = f"{sampler}{'+adaptive' if adaptive else ''}"
            print(f"[{label:14s}] {ck * SPP_STEP:5d} spp-eq: "
                  f"rmse {pts[-1]['rmse']:.3e} ({spent:.1f}s)", file=sys.stderr)
        return pts

    curves = {
        "prng_uniform": run_curve("prng", False),
        "sobol_uniform": run_curve("sobol", False),
        "prng_adaptive": run_curve("prng", True),
        "sobol_adaptive": run_curve("sobol", True),
    }

    # --- kernel-rate cost of the sobol bit math (300 spp/step) ---
    rates = {}
    for name, cfg in cfgs.items():
        settings = RenderSettings.make(samples_per_step=300, seed=7)
        work = to_device_batch(wl)
        work = render_step(scene, settings, cfg, work, make_base_key(1), env)
        float(sync(work))  # compile + warm
        t0 = time.monotonic()
        steps = 4
        for s in range(steps):
            work = render_step(scene, settings, cfg, work,
                               jax.random.fold_in(make_base_key(1), s), env)
        float(sync(work))
        dt = time.monotonic() - t0
        rates[name] = round(W * H * 300 * steps / dt / 1e6, 1)
        print(f"rate[{name}]: {rates[name]} Mpaths/s", file=sys.stderr)

    # --- hardware consistency: in-kernel sobol vs host-precomputed rows ---
    w2, h2, spp2 = 256, 256, 4
    cfg2 = StaticConfig(width=w2, height=h2, sampler="sobol")
    cfg2_host = cfg2._replace(pallas_interpret=spp2)
    settings2 = RenderSettings.make(samples_per_step=spp2, seed=7)
    wl2 = make_worklist(w2, h2)
    work2 = to_device_batch(wl2)
    out_hw = render_step(scene, settings2, cfg2, work2, make_base_key(3), env)
    out_host = render_step(scene, settings2, cfg2_host, work2,
                           make_base_key(3), env)
    a = np.asarray(out_hw.r)
    b = np.asarray(out_host.r)
    d = np.abs(a - b)
    consistency = {
        "frame": [w2, h2], "spp": spp2,
        "diverged_fraction": float((d > 1e-2).mean()),
        "agreeing_max_abs": float(d[d <= 1e-2].max()) if (d <= 1e-2).any() else None,
        "sum_r_hw": float(a.sum()), "sum_r_host": float(b.sum()),
    }
    print(f"hw-vs-host sobol: {consistency}", file=sys.stderr)

    effs = {}
    for k in ("sobol_uniform", "prng_adaptive", "sobol_adaptive"):
        effs[k] = [
            round((u["rmse"] / c["rmse"]) ** 2, 3)
            for u, c in zip(curves["prng_uniform"], curves[k])
        ]
    result = {
        "frame": [W, H], "assets": os.path.basename(assets),
        "gt_spp": GT_SPP, "spp_per_step": SPP_STEP,
        "curves": curves,
        "sample_efficiency_vs_prng_uniform": effs,
        "rates_mpaths_300spp": rates,
        "hw_vs_host_consistency": consistency,
    }
    out = os.path.join(REPO, "docs", "SOBOL.json")
    if os.path.exists(out):
        prior = json.load(open(out))
        prior.update(result)
        result = prior
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({"sample_efficiency": effs,
                      "rates": rates, "written": out}))


if __name__ == "__main__":
    main()
