"""Probe: does a path-length-COHERENT worklist layout beat raster order?

The megastep's dead-block early-out skips bounce work only when EVERY
lane in a 2048-record block is dead (ops/megastep_pallas.py).  The
default raster layout makes a block a ~2-row image strip: strips above
the scene geometry die on the primary bounce, but any strip crossing a
sphere or the floor disc stays alive for the whole unroll.

The reference's load balancer deals (shortest, longest) path pairs to
each tile to EQUALISE load across MIMD tiles (LoadBalancer.cpp:141-192).
A SIMD machine wants the exact opposite: concentrate similar path
lengths so whole blocks die together.  This probe sorts the worklist
once by the primary hit class of each pixel's central ray (sky-miss /
emissive / diffuse / specular / refractive - a static, jitter-free
approximation of expected path length) and benches the fused megastep
on the canonical 1104x1000 / 300 spp config against raster order and
the seed-142 shuffle.

Run on the TPU: python scripts/coherent_layout_probe.py [asset_dir]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WIDTH, HEIGHT = 1104, 1000
SPP = 300


def primary_hit_key(scene, u, v, fov_degrees) -> np.ndarray:
    """Class key; the production implementation lives in
    runtime/worklist.primary_hit_class (this probe validated it)."""
    from ipu_path_trace_tpu.runtime.worklist import primary_hit_class

    return primary_hit_class(scene, np.asarray(u), np.asarray(v),
                             WIDTH, HEIGHT, fov_degrees)


def permute_batch(batch, perm):
    from ipu_path_trace_tpu.core.records import WorkBatch

    p = np.asarray(perm)
    return WorkBatch(*[jnp.asarray(np.asarray(f)[p]) for f in batch])


def measure(label, env, scene, cfg, settings, work, sync):
    from ipu_path_trace_tpu.render.wavefront import make_base_key, render_step

    t0 = time.monotonic()
    out = render_step(scene, settings, cfg, work, make_base_key(0), env)
    float(sync(out))
    print(f"[{label}] compile+first step: {time.monotonic() - t0:.1f}s",
          file=sys.stderr)
    t0 = time.monotonic()
    out = render_step(scene, settings, cfg, out, make_base_key(1), env)
    float(sync(out))
    step_s = time.monotonic() - t0
    steps = max(3, int(10.0 / step_s) + 1)
    t0 = time.monotonic()
    for i in range(steps):
        out = render_step(scene, settings, cfg, out, make_base_key(i + 2), env)
    float(sync(out))
    secs = time.monotonic() - t0
    mpaths = WIDTH * HEIGHT * SPP * steps / secs / 1e6
    ms = 1e3 * secs / steps / SPP
    print(f"[{label}] {mpaths:.1f} Mpaths/s ({ms:.3f} ms/sample, {steps} steps)")
    return mpaths


def main():
    from ipu_path_trace_tpu.core.records import make_worklist, to_device_batch
    from ipu_path_trace_tpu.core.scene import default_scene
    from ipu_path_trace_tpu.models.envlight import NifEnv
    from ipu_path_trace_tpu.models.nif import load_nif_assets
    from ipu_path_trace_tpu.render.params import RenderSettings, StaticConfig

    asset = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "assets", "nif_w192e16")
    print(f"device: {jax.devices()[0]}  asset: {asset}", file=sys.stderr)
    _ = float(jnp.sum(jnp.arange(8.0)))  # tunnel warmup

    scene = default_scene()
    cfg = StaticConfig(width=WIDTH, height=HEIGHT)
    settings = RenderSettings.make(samples_per_step=SPP)
    params, _, _ = load_nif_assets(asset, jnp.bfloat16)
    env = NifEnv(params=params)
    sync = jax.jit(lambda w: w.r[0] + w.b[-1])

    wl = make_worklist(WIDTH, HEIGHT)
    batch = to_device_batch(wl)

    key = primary_hit_key(scene, wl["u"], wl["v"], 90.0)
    frac = {int(k): float((key == k).mean()) for k in np.unique(key)}
    print(f"primary-hit class fractions: {frac}", file=sys.stderr)

    raster_idx = np.arange(len(wl))
    perm_sorted = np.lexsort((raster_idx, key))
    rng = np.random.default_rng(142)
    perm_shuf = rng.permutation(len(wl))

    r_raster = measure("raster ", env, scene, cfg, settings, batch, sync)
    r_sorted = measure("coherent", env, scene, cfg, settings,
                       permute_batch(batch, perm_sorted), sync)
    r_shuf = measure("shuffled", env, scene, cfg, settings,
                     permute_batch(batch, perm_shuf), sync)
    print(f"coherent vs raster: {100 * (r_sorted / r_raster - 1):+.1f}%  "
          f"shuffled vs raster: {100 * (r_shuf / r_raster - 1):+.1f}%")


if __name__ == "__main__":
    main()
