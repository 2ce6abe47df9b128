"""BASELINE accuracy acceptance: RMSE vs the CPU reference at 1k spp.

Closes the BASELINE.json north-star line item "RMSE <= 1e-3 vs the
CPU reference at 1k spp": renders the default scene with the wavefront
renderer and replays the IDENTICAL counter-derived random streams
through the independent NumPy oracle (cpu/oracle.py - shares no code
with the jax path), then reports per-pixel RMSE of the 1k-spp means.

Exact replay makes this a measure of implementation divergence rather
than Monte-Carlo noise; lanes where a float32 rounding difference flips
a discontinuous branch (grazing hits, the 0.4/0.4001 clear-coat shell,
roulette thresholds) diverge chaotically and are reported separately,
exactly like tests/test_oracle_parity.py.

Writes docs/RMSE.json.  Run CPU-only:
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/validate_rmse.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

W = H = int(os.environ.get("RMSE_SIZE", "24"))
SPP = int(os.environ.get("RMSE_SPP", "1000"))
SEED = 7


def main() -> None:
    from ipu_path_trace_tpu.core import default_scene
    from ipu_path_trace_tpu.core.records import make_worklist, to_device_batch
    from ipu_path_trace_tpu.cpu import oracle_scene_from, render_oracle
    from ipu_path_trace_tpu.models import ConstantEnv
    from ipu_path_trace_tpu.render import RenderSettings, StaticConfig
    from ipu_path_trace_tpu.render.wavefront import render_step

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from test_oracle_parity import SETTINGS, _jax_streams

    colour = np.asarray([1.0, 0.8, 0.6], np.float32)
    scene = default_scene()
    cfg = StaticConfig(width=W, height=H, max_path_length=SETTINGS["max_path_length"])
    settings = RenderSettings(
        fov=jnp.float32(SETTINGS["fov"]),
        aa_scale=jnp.float32(SETTINGS["aa_scale"]),
        azimuth=jnp.float32(SETTINGS["azimuth"]),
        refractive_index=jnp.float32(SETTINGS["refractive_index"]),
        stop_prob=jnp.float32(SETTINGS["stop_prob"]),
        roulette_depth=jnp.int32(SETTINGS["roulette_depth"]),
        samples_per_step=jnp.int32(SPP),
        aperture=jnp.float32(0.0),
        focal_distance=jnp.float32(1.0),
    )
    key = jax.random.key(SEED)

    t0 = time.monotonic()
    out = render_step(
        scene, settings, cfg, to_device_batch(make_worklist(W, H)), key,
        ConstantEnv(colour=jnp.asarray(colour)),
    )
    img_jax = (
        np.stack([np.asarray(out.r), np.asarray(out.g), np.asarray(out.b)], -1) / SPP
    ).reshape(H, W, 3)
    print(f"wavefront render: {time.monotonic()-t0:.1f}s", file=sys.stderr)

    t0 = time.monotonic()
    img_oracle = render_oracle(
        oracle_scene_from(scene), W, H, SPP,
        env=("constant", colour),
        stream_fn=lambda s: _jax_streams(key, s, W * H, SETTINGS["max_path_length"]),
        fov=SETTINGS["fov"], aa_scale=SETTINGS["aa_scale"],
        azimuth=SETTINGS["azimuth"],
        refractive_index=SETTINGS["refractive_index"],
        stop_prob=SETTINGS["stop_prob"],
        roulette_depth=SETTINGS["roulette_depth"],
        max_path_length=SETTINGS["max_path_length"],
    )
    print(f"oracle render: {time.monotonic()-t0:.1f}s", file=sys.stderr)

    diff = img_jax - img_oracle
    rmse = float(np.sqrt(np.mean(diff**2)))
    maxdiff = np.abs(diff).max(axis=-1)
    diverged = maxdiff > 1e-2
    agree_rmse = float(np.sqrt(np.mean(diff[~diverged] ** 2)))
    result = {
        "scene": "default (codelets.cpp:111-144)",
        "env": "constant",
        "width": W, "height": H, "spp": SPP, "seed": SEED,
        "rmse": rmse,
        "rmse_agreeing_lanes": agree_rmse,
        "diverged_pixel_fraction": float(diverged.mean()),
        "criterion": "rmse <= 1e-3 at 1k spp (BASELINE.json north_star)",
        "pass": bool(rmse <= 1e-3),
        "note": "exact stream replay vs the independent NumPy oracle; "
                "diverged pixels are chaotic branch flips at float32 "
                "discontinuities (see tests/test_oracle_parity.py)",
    }
    os.makedirs("docs", exist_ok=True)
    with open("docs/RMSE.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
