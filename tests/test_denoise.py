"""À-trous denoiser (film/denoise.py): guides, filter properties, wiring.

The denoiser is a pure post-process beyond the reference's feature set
(the reference saves the raw film, src/AccumulatedImage.cpp:48-56), so
there is no oracle to replay against; instead the tests pin the
properties that make it safe and useful: guide correctness against the
scene definition, large variance reduction on flat regions, edge
preservation across guide boundaries, exact albedo (de)modulation, and
that --denoise only changes SAVED images, never the accumulator.
"""

import math

import numpy as np
import pytest

from ipu_path_trace_tpu.core.scene import Material, default_scene
from ipu_path_trace_tpu.film.denoise import denoise_hdr, primary_features

W = H = 64
FOV = math.radians(90.0)


@pytest.fixture(scope="module")
def guides():
    return primary_features(default_scene(), W, H, FOV)


def test_primary_features_match_scene(guides):
    scene = default_scene()
    # Top corners look above the horizon: sky (no object up there).
    assert guides["disparity"][0, 0] == 0.0
    assert guides["disparity"][0, W - 1] == 0.0
    np.testing.assert_allclose(guides["albedo"][0, 0], 1.0)
    # Sky normals are the (unit) ray directions.
    assert abs(np.linalg.norm(guides["normal"][0, 0]) - 1.0) < 1e-5
    # The central pixel hits the middle mirror sphere: albedo 1 (not
    # demodulated - SPECULAR), valid disparity.
    cy, cx = H // 2, W // 2
    assert guides["disparity"][cy, cx] > 0.0
    np.testing.assert_allclose(guides["albedo"][cy, cx], 1.0)
    # Floor pixels (diffuse) demodulate with the floor colour
    # (codelets.cpp:127-130 gain baked in) and carry the +y disc normal.
    floor_rgb = np.asarray(scene.colour)[-1]
    assert int(np.asarray(scene.material)[-1]) == int(Material.DIFFUSE)
    floor_mask = np.all(np.abs(guides["albedo"] - floor_rgb) < 1e-5, axis=-1)
    assert floor_mask.sum() > 50  # the floor is visible
    np.testing.assert_allclose(
        guides["normal"][floor_mask],
        np.tile([0.0, 1.0, 0.0], (int(floor_mask.sum()), 1)), atol=1e-6)
    assert (guides["disparity"][floor_mask] > 0.0).all()


def test_env_albedo_guides_preserve_sky_detail():
    """With env=... the escaped-primary albedo is the env radiance, so a
    textured sky demodulates to ~flat and survives filtering bit-sharp,
    where the flat-albedo guide blurs it."""
    import jax.numpy as jnp

    from ipu_path_trace_tpu.models.envlight import ConstantEnv, TextureEnv

    scene = default_scene()
    c = np.asarray([0.5, 0.25, 0.125], np.float32)
    g_const = primary_features(scene, W, H, FOV, env=ConstantEnv(
        colour=jnp.asarray(c)))
    sky = g_const["disparity"] == 0.0
    assert sky.any()
    np.testing.assert_allclose(g_const["albedo"][sky],
                               np.tile(c, (int(sky.sum()), 1)), rtol=1e-6)

    # High-contrast checker env: denoise a noisy render-alike and check
    # the sky pattern survives with env guides but not without.
    rng = np.random.default_rng(13)
    tex = np.where((np.indices((32, 64)).sum(axis=0) % 2)[..., None] > 0,
                   4.0, 0.25).astype(np.float32) * np.ones(3, np.float32)
    g_tex = primary_features(scene, W, H, FOV,
                             env=TextureEnv(texture=jnp.asarray(tex)))
    clean = g_tex["albedo"].copy()  # converged sky = env radiance
    noisy = clean * (1.0 + rng.normal(0, 0.3, clean.shape).astype(np.float32))
    out_guided = denoise_hdr(noisy, g_tex, sigma_colour=2.0)
    out_flat = denoise_hdr(noisy, dict(g_tex, albedo=np.ones_like(clean)),
                           sigma_colour=2.0)
    err_guided = float(np.sqrt(np.mean((out_guided[sky] - clean[sky]) ** 2)))
    err_flat = float(np.sqrt(np.mean((out_flat[sky] - clean[sky]) ** 2)))
    err_raw = float(np.sqrt(np.mean((noisy[sky] - clean[sky]) ** 2)))
    assert err_guided < 0.5 * err_raw, (err_guided, err_raw)
    assert err_guided < 0.7 * err_flat, (err_guided, err_flat)


def test_flat_region_variance_reduction(guides):
    rng = np.random.default_rng(3)
    clean = np.full((H, W, 3), 0.8, np.float32) * guides["albedo"]
    noisy = clean + (rng.normal(0, 0.25, (H, W, 3)).astype(np.float32)
                     * guides["albedo"])
    out = denoise_hdr(noisy, guides)
    rms_in = float(np.sqrt(np.mean((noisy - clean) ** 2)))
    rms_out = float(np.sqrt(np.mean((out - clean) ** 2)))
    assert rms_out < 0.35 * rms_in, (rms_in, rms_out)
    assert out.shape == clean.shape and out.dtype == np.float32


def test_edge_preserved_across_guide_boundary():
    """A radiance step co-located with a normal+depth edge must survive."""
    rng = np.random.default_rng(5)
    half = W // 2
    clean = np.zeros((H, W, 3), np.float32)
    clean[:, :half] = 0.2
    clean[:, half:] = 2.0
    guides = {
        "albedo": np.ones((H, W, 3), np.float32),
        "normal": np.zeros((H, W, 3), np.float32),
        "disparity": np.zeros((H, W), np.float32),
    }
    guides["normal"][:, :half, 0] = 1.0
    guides["normal"][:, half:, 1] = 1.0
    guides["disparity"][:, :half] = 0.5
    guides["disparity"][:, half:] = 0.05
    noisy = clean + rng.normal(0, 0.1, (H, W, 3)).astype(np.float32)
    out = denoise_hdr(noisy, guides)
    # Means per side preserved (no bleed across the edge):
    assert abs(float(out[:, : half - 4].mean()) - 0.2) < 0.02
    assert abs(float(out[:, half + 4:].mean()) - 2.0) < 0.05
    # The step itself stays sharp: adjacent columns at the boundary.
    step = float(out[:, half].mean() - out[:, half - 1].mean())
    assert step > 1.4, step


def test_albedo_demodulation_exact(guides):
    """denoise(albedo * c) == albedo * denoise_flat(c): texture detail in
    the albedo costs nothing."""
    rng = np.random.default_rng(7)
    base = (0.5 + rng.normal(0, 0.1, (H, W, 3))).astype(np.float32)
    flat_guides = dict(guides, albedo=np.ones((H, W, 3), np.float32))
    out_flat = denoise_hdr(base, flat_guides)
    out_mod = denoise_hdr(base * guides["albedo"], guides)
    np.testing.assert_allclose(out_mod, out_flat * guides["albedo"],
                               rtol=2e-4, atol=2e-5)


def test_firefly_clamp_kills_outliers_keeps_highlights(guides):
    """A single-pixel 1e4 outlier is suppressed; a 5x5 true highlight
    (its own neighbourhood median is bright) passes through."""
    flat_guides = {
        "albedo": np.ones((H, W, 3), np.float32),
        "normal": np.tile(np.float32([0, 0, 1]), (H, W, 1)),
        "disparity": np.full((H, W), 0.3, np.float32),
    }
    img = np.full((H, W, 3), 1.0, np.float32)
    img[10, 10] = 1e4  # firefly
    img[30:35, 30:35] = 500.0  # real highlight block
    out = denoise_hdr(img, flat_guides, iterations=1)
    assert out[10, 10].max() < 50.0, out[10, 10]  # ~10x median, not 1e4
    assert out[32, 32].max() > 250.0, out[32, 32]  # highlight survives
    # With the clamp off the firefly survives (edge-stop isolates it):
    out_off = denoise_hdr(img, flat_guides, iterations=1, firefly_clamp=0.0)
    assert out_off[10, 10].max() > 1e3


def test_denoise_deterministic(guides):
    rng = np.random.default_rng(11)
    img = rng.random((H, W, 3), np.float32)
    a = denoise_hdr(img, guides, iterations=2)
    b = denoise_hdr(img, guides, iterations=2)
    np.testing.assert_array_equal(a, b)


def test_cli_denoise_end_to_end(tmp_path):
    """--denoise writes filtered outputs; the accumulator stays the raw
    Monte-Carlo state.  Uses the caustic scene so the 8 spp preview has
    real noise to remove."""
    import pathlib

    from ipu_path_trace_tpu.film.imageio import read_exr
    from ipu_path_trace_tpu.runtime.app import PathTracerApp
    from ipu_path_trace_tpu.runtime.cli import parse_config

    scene_json = str(pathlib.Path(__file__).parent.parent
                     / "assets" / "scenes" / "glass_caustic.json")
    out = tmp_path / "img.png"
    raw_out = tmp_path / "raw.png"

    def run(outfile, extra):
        cfg = parse_config([
            "-o", str(outfile), "-w", "48", "--height", "48",
            "-s", "8", "--samples-per-step", "8", "--scene", scene_json,
            "--assets", "constant:0.6,0.5,0.4", "--seed", "3",
        ] + extra)
        app = PathTracerApp(cfg)
        app.init()
        app.build()
        return app.execute()

    film_raw = run(raw_out, [])
    film_dn = run(out, ["--denoise", "--denoise-iters", "2"])
    # Accumulators identical: denoise is save-path only.
    np.testing.assert_array_equal(film_raw.hdr, film_dn.hdr)
    hdr_raw = read_exr(str(raw_out.with_suffix(".exr")))
    hdr_dn = read_exr(str(out.with_suffix(".exr")))
    assert hdr_dn.shape == hdr_raw.shape
    assert np.isfinite(hdr_dn).all()
    assert not np.array_equal(hdr_dn, hdr_raw)  # the filter did something
    # The filter must reduce Monte-Carlo noise where there is some.  The
    # win is on the DISPLAYED image (linear-HDR metrics are dominated by
    # a handful of caustic fireflies the edge-stop rightly isolates), so
    # measure high-frequency energy after the reference tone map:
    from ipu_path_trace_tpu.film.film import tone_map

    def hf_energy(hdr):
        reg = tone_map(hdr, 1, 0.0, 2.2).astype(np.float32)[16:] / 255.0
        m = (reg[:-2, :-2] + reg[:-2, 1:-1] + reg[:-2, 2:]
             + reg[1:-1, :-2] + reg[1:-1, 1:-1] + reg[1:-1, 2:]
             + reg[2:, :-2] + reg[2:, 1:-1] + reg[2:, 2:]) / 9.0
        return float(np.sqrt(np.mean((reg[1:-1, 1:-1] - m) ** 2)))

    assert hf_energy(hdr_dn) < 0.6 * hf_energy(hdr_raw)
    lo_raw, lo_dn = hdr_raw[24:], hdr_dn[24:]
    assert abs(float(lo_dn.mean() - lo_raw.mean())) < 0.05 * float(lo_raw.mean())


def test_denoise_with_device_film(tmp_path):
    """--denoise composes with --device-film (the fetch-at-save path
    goes through the same _save_films helper)."""
    from ipu_path_trace_tpu.film.imageio import read_exr
    from ipu_path_trace_tpu.runtime.app import PathTracerApp
    from ipu_path_trace_tpu.runtime.cli import parse_config

    out = tmp_path / "df.png"
    cfg = parse_config([
        "-o", str(out), "-w", "48", "--height", "48",
        "-s", "8", "--samples-per-step", "8", "--device-film",
        "--assets", "constant:0.6,0.5,0.4", "--seed", "3",
        "--denoise", "--denoise-iters", "2",
    ])
    app = PathTracerApp(cfg)
    app.init()
    app.build()
    film = app.execute()
    hdr = read_exr(str(out.with_suffix(".exr")))
    assert np.isfinite(hdr).all() and hdr.shape == (48, 48, 3)
    # Saved image is the filtered one, accumulator is raw:
    assert not np.array_equal(hdr, film.hdr_at_step(1))


def test_device_preview_denoised_matches_host_pipeline():
    """The on-device denoised preview (device-film + UI + --denoise)
    must match the host pipeline: Film.accumulate -> denoise_hdr ->
    tone_map."""
    import jax.numpy as jnp

    from ipu_path_trace_tpu.core.records import (
        make_worklist, raster_permutation, to_device_batch,
    )
    from ipu_path_trace_tpu.film.film import Film, tone_map
    from ipu_path_trace_tpu.runtime.app import _device_preview_denoised

    w = h = 16
    rng = np.random.default_rng(17)
    wl = make_worklist(w, h)
    wl["r"] = rng.random(len(wl)).astype(np.float32) * 4.0
    wl["g"] = rng.random(len(wl)).astype(np.float32) * 4.0
    wl["b"] = rng.random(len(wl)).astype(np.float32) * 4.0
    wl["sampleCount"][:] = 6
    guides = {
        "albedo": (0.5 + rng.random((h, w, 3))).astype(np.float32),
        "normal": np.tile(np.float32([0, 0, 1]), (h, w, 1)),
        "disparity": rng.random((h, w)).astype(np.float32),
    }
    perm = jnp.asarray(raster_permutation(wl, w, h))
    dev = np.asarray(_device_preview_denoised(
        to_device_batch(wl), perm, jnp.float32(0.25), jnp.float32(2.2),
        jnp.asarray(guides["albedo"]), jnp.asarray(guides["normal"]),
        jnp.asarray(guides["disparity"]),
        jnp.float32(1.0), jnp.float32(10.0),
        width=w, height=h, iterations=2,
    ))
    film = Film(w, h)
    film.accumulate(wl)
    host = tone_map(
        denoise_hdr(film.hdr_at_step(1), guides, iterations=2,
                    sigma_colour=1.0, firefly_clamp=10.0),
        1, 0.25, 2.2)
    diff = np.abs(dev.astype(int) - host.astype(int))
    assert diff.max() <= 1, f"max LDR diff {diff.max()}"


def test_device_preview_denoised_on_mesh():
    """The on-device denoised preview also compiles and matches when the
    resident worklist is pixel-sharded over the 8-device mesh (XLA
    inserts the gather collectives)."""
    import jax
    import jax.numpy as jnp

    from ipu_path_trace_tpu.core.records import (
        make_worklist, raster_permutation, to_device_batch,
    )
    from ipu_path_trace_tpu.parallel.mesh import make_mesh, shard_work
    from ipu_path_trace_tpu.runtime.app import _device_preview_denoised

    w, h = 32, 16  # 512 records = 64/device
    rng = np.random.default_rng(23)
    wl = make_worklist(w, h)
    wl["r"] = rng.random(len(wl)).astype(np.float32)
    wl["g"] = rng.random(len(wl)).astype(np.float32)
    wl["b"] = rng.random(len(wl)).astype(np.float32)
    wl["sampleCount"][:] = 3
    guides = (
        jnp.ones((h, w, 3), jnp.float32),
        jnp.tile(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (h, w, 1)),
        jnp.full((h, w), 0.5, jnp.float32),
    )
    perm = jnp.asarray(raster_permutation(wl, w, h))
    args = (perm, jnp.float32(0.0), jnp.float32(2.2), *guides,
            jnp.float32(1.0), jnp.float32(10.0))
    single = np.asarray(_device_preview_denoised(
        to_device_batch(wl), *args, width=w, height=h, iterations=2))
    mesh = make_mesh(8, "8x1")
    sharded = np.asarray(_device_preview_denoised(
        shard_work(to_device_batch(wl), mesh), *args,
        width=w, height=h, iterations=2))
    np.testing.assert_array_equal(single, sharded)


def test_denoise_iters_validated():
    from ipu_path_trace_tpu.runtime.cli import parse_config

    with pytest.raises(ValueError):
        parse_config(["--assets", "constant:1,1,1", "--denoise-iters", "0",
                      "-o", "x.png"])
