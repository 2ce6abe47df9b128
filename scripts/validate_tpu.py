"""On-TPU validation: fused Pallas path vs XLA wavefront, statistically.

The Pallas megakernel uses the core's hardware PRNG while the XLA path
uses counter-based jax.random keys, so their images agree statistically,
not bitwise: both are unbiased estimators of the same integral.  This
script renders the same scene through both paths at equal sample counts
and reports the normalised RMSE between them alongside the Monte-Carlo
noise floor (the RMSE between two independent XLA renders).  A correct
kernel lands at the noise floor; a biased one sits above it and stays
there as spp grows.

Run on a machine with an attached TPU:  python scripts/validate_tpu.py
"""

from __future__ import annotations

import os
import sys

# Runnable from anywhere without installing the package:
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def render(use_pallas: bool, seed: int, width, height, spp):
    from ipu_path_trace_tpu.core.records import (
        from_device_batch, make_worklist, to_device_batch,
    )
    from ipu_path_trace_tpu.core.scene import default_scene
    from ipu_path_trace_tpu.film.film import Film
    from ipu_path_trace_tpu.models.envlight import NifEnv
    from ipu_path_trace_tpu.models.nif import make_params, make_synthetic_nif
    from ipu_path_trace_tpu.render.params import RenderSettings, StaticConfig
    from ipu_path_trace_tpu.render.wavefront import make_base_key, render_step

    weights, meta = make_synthetic_nif(key=0)
    env = NifEnv(params=make_params(weights, meta, jnp.bfloat16))
    cfg = StaticConfig(width=width, height=height, use_pallas=use_pallas)
    settings = RenderSettings.make(samples_per_step=spp)
    work = to_device_batch(make_worklist(width, height))
    out = render_step(
        default_scene(), settings, cfg, work,
        make_base_key(seed, "rbg" if use_pallas else "threefry2x32"), env,
    )
    film = Film(width, height)
    film.accumulate(from_device_batch(out))
    return film.hdr_at_step(1)


def render_texture(use_pallas: bool, seed: int, width, height, spp):
    """Texture-env render at the canonical resolution: exercises the
    Pallas trace megakernel (the texture lookup itself is XLA) at
    1104x1000 - BASELINE config 2's scale."""
    import os

    from ipu_path_trace_tpu.core.records import (
        from_device_batch, make_worklist, to_device_batch,
    )
    from ipu_path_trace_tpu.core.scene import default_scene
    from ipu_path_trace_tpu.film.film import Film
    from ipu_path_trace_tpu.film.imageio import read_exr
    from ipu_path_trace_tpu.models.envlight import TextureEnv
    from ipu_path_trace_tpu.render.params import RenderSettings, StaticConfig
    from ipu_path_trace_tpu.render.wavefront import make_base_key, render_step

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    tex = read_exr(os.path.join(repo, "assets", "procedural_sky.exr"))
    env = TextureEnv(texture=jnp.asarray(tex))
    cfg = StaticConfig(width=width, height=height, use_pallas=use_pallas)
    settings = RenderSettings.make(samples_per_step=spp)
    work = to_device_batch(make_worklist(width, height))
    out = render_step(
        default_scene(), settings, cfg, work,
        make_base_key(seed, "rbg" if use_pallas else "threefry2x32"), env,
    )
    film = Film(width, height)
    film.accumulate(from_device_batch(out))
    return film.hdr_at_step(1)


def render_adaptive(use_adaptive: bool, seed: int, width, height, spp):
    """Adaptive-vs-uniform on HARDWARE: both are unbiased estimators of
    the same integral, so their means agree statistically - this drives
    the per-block SMEM budget loop bound + lum2 stats carry on the real
    chip (render/adaptive.py; the CPU tests cover interpret mode only).
    Runs 4 steps so the controller leaves its uniform cold start."""
    from ipu_path_trace_tpu.core.records import (
        from_device_batch, make_worklist, to_device_batch,
    )
    from ipu_path_trace_tpu.core.scene import default_scene
    from ipu_path_trace_tpu.film.film import Film
    from ipu_path_trace_tpu.models.envlight import NifEnv
    from ipu_path_trace_tpu.models.nif import make_params, make_synthetic_nif
    from ipu_path_trace_tpu.render.adaptive import adaptive_render_step
    from ipu_path_trace_tpu.render.params import RenderSettings, StaticConfig
    from ipu_path_trace_tpu.render.wavefront import make_base_key, render_step

    steps = 4
    weights, meta = make_synthetic_nif(key=0)
    env = NifEnv(params=make_params(weights, meta, jnp.bfloat16))
    scene = default_scene()
    cfg = StaticConfig(width=width, height=height)
    settings = RenderSettings.make(samples_per_step=spp // steps)
    work = to_device_batch(make_worklist(width, height))
    lum2 = jnp.zeros(work.u.shape[0], jnp.float32)
    base = make_base_key(seed, "rbg")
    for step in range(1, steps + 1):
        k = jax.random.fold_in(base, step)
        if use_adaptive:
            work, lum2 = adaptive_render_step(
                scene, settings, cfg, work, lum2, k, env)
        else:
            work = render_step(scene, settings, cfg, work, k, env)
    wb = jax.tree.map(np.asarray, work)
    if use_adaptive:
        # The controller really adapted (non-uniform counts) and the
        # count bookkeeping is consistent with the budget floor/cap:
        counts = wb.sample_count
        # Step 1 is the uniform cold start; later steps never go below
        # the floor:
        assert counts.min() >= spp // steps + 3 * min(cfg.adaptive_min,
                                                      spp // steps)
        assert counts.min() != counts.max(), "controller never adapted"
    film = Film(width, height)
    film.accumulate_soa(wb.u, wb.v, wb.r, wb.g, wb.b, wb.sample_count)
    return film.hdr_at_step(1)


def rmse(a, b):
    scale = max(np.abs(a).max(), np.abs(b).max(), 1e-9)
    return float(np.sqrt(np.mean((a - b) ** 2)) / scale)


def _check(name, render_fn, width, height, spp) -> bool:
    print(f"[{name}] {width}x{height} @ {spp} spp")
    xla_a = render_fn(False, 1, width, height, spp)
    xla_b = render_fn(False, 2, width, height, spp)
    pallas = render_fn(True, 3, width, height, spp)
    floor = rmse(xla_a, xla_b)
    cross = rmse(xla_a, pallas)
    print(f"[{name}] MC noise floor (xla vs xla, indep seeds): {floor:.5f}")
    print(f"[{name}] pallas vs xla                           : {cross:.5f}")
    ok = cross < 1.5 * floor + 1e-4
    print(f"[{name}] {'PASS' if ok else 'FAIL (pallas path biased vs XLA)'}")
    return ok


def main() -> int:
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    print(f"device: {jax.devices()[0]}")
    ok = _check("nif-env", render, 128, 128, spp)
    # Texture env at the canonical 1104x1000 (fewer spp: 3 full-res
    # renders; the floor scales to the sample count identically):
    ok &= _check("texture-env-1104x1000", render_texture, 1104, 1000,
                 max(16, spp // 8))
    # Adaptive vs uniform on hardware: "floor" = two independent uniform
    # renders, "cross" = adaptive vs uniform - unbiasedness of the HW
    # budget path (the CPU suite covers interpret mode only).  Uses a
    # larger frame so the controller has blocks to differentiate:
    ok &= _check("adaptive-vs-uniform", render_adaptive, 512, 512, spp)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
