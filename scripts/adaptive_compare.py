"""Render the equal-budget uniform-vs-adaptive comparison figure.

Two renders of the canonical frame at the SAME nominal sample total
(default 512 spp-equivalent), one uniform and one adaptive, saved as a
side-by-side PNG with a crop row over the noisiest region (the floor
disc / glass caustics).  The visual companion to
scripts/adaptive_bench.py / docs/ADAPTIVE.json.

Usage: python scripts/adaptive_compare.py [assets_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ipu_path_trace_tpu.core.records import make_worklist, to_device_batch
from ipu_path_trace_tpu.core.scene import default_scene
from ipu_path_trace_tpu.film.film import Film
from ipu_path_trace_tpu.film.imageio import write_png
from ipu_path_trace_tpu.models.envlight import NifEnv
from ipu_path_trace_tpu.models.nif import load_nif_assets
from ipu_path_trace_tpu.render.adaptive import adaptive_render_step
from ipu_path_trace_tpu.render.params import RenderSettings, StaticConfig
from ipu_path_trace_tpu.render.wavefront import make_base_key, render_step
from ipu_path_trace_tpu.runtime.worklist import coherent_order

W, H = 1104, 1000
SPP_STEP = 128
STEPS = int(os.environ.get("AC_STEPS", 4))  # 512 spp-equivalent


def _film(wl, wb):
    film = Film(W, H)
    film.accumulate_soa(wb.u, wb.v, wb.r, wb.g, wb.b, wb.sample_count)
    return film.ldr(1, exposure=0.0, gamma=2.2)


def main() -> None:
    assets = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "assets", "nif_w192e16")
    params, _, _ = load_nif_assets(assets, jnp.bfloat16)
    env = NifEnv(params=params)
    scene = default_scene()
    cfg = StaticConfig(width=W, height=H)
    settings = RenderSettings.make(samples_per_step=SPP_STEP)
    wl = coherent_order(make_worklist(W, H), scene, W, H, 90.0)
    base = make_base_key(7)

    def render(adaptive: bool):
        work = to_device_batch(wl)
        lum2 = jnp.zeros(work.u.shape[0], jnp.float32)
        for step in range(1, STEPS + 1):
            k = jax.random.fold_in(base, step)
            if adaptive:
                work, lum2 = adaptive_render_step(
                    scene, settings, cfg, work, lum2, k, env)
            else:
                work = render_step(scene, settings, cfg, work, k, env)
        wb = jax.tree.map(np.asarray, work)
        return _film(wl, wb)

    uni = render(False)
    ada = render(True)

    # Side-by-side full frames + a zoomed crop row over the floor/glass
    # region (high variance - where adaptive reallocates to):
    gap = np.full((H, 8, 3), 255, np.uint8)
    top = np.concatenate([uni, gap, ada], axis=1)
    cy, cx, cs = int(H * 0.62), int(W * 0.55), 220  # crop centre + size
    crops = []
    for img in (uni, ada):
        c = img[cy:cy + cs, cx:cx + cs]
        c = np.repeat(np.repeat(c, 2, axis=0), 2, axis=1)  # 2x zoom
        crops.append(c)
    gap2 = np.full((crops[0].shape[0], 8, 3), 255, np.uint8)
    bottom = np.concatenate([crops[0], gap2, crops[1]], axis=1)
    pad = np.full((bottom.shape[0], top.shape[1] - bottom.shape[1], 3), 20,
                  np.uint8)
    bottom = np.concatenate([bottom, pad], axis=1)
    figure = np.concatenate([top, np.full((8, top.shape[1], 3), 255, np.uint8),
                             bottom], axis=0)
    out = os.path.join(REPO, "docs", "adaptive_compare.png")
    write_png(out, figure)
    print(f"wrote {out}: uniform (left) vs adaptive (right), "
          f"{STEPS * SPP_STEP} spp-equivalent each; bottom row = 2x crop")


if __name__ == "__main__":
    main()
