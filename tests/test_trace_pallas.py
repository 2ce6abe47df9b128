"""Exact parity of the fused Pallas trace megakernel vs the XLA wavefront.

Runs the kernel in interpret mode (CPU) in host-noise mode and feeds the
IDENTICAL noise to render/wavefront.trace_sample_with_uniforms - the two
implement the same bounce semantics (wavefront.bounce_body), so every
output matches to float associativity.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ipu_path_trace_tpu.core.records import make_worklist
from ipu_path_trace_tpu.core.scene import default_scene
from ipu_path_trace_tpu.ops.trace_pallas import trace_sample_pallas
from ipu_path_trace_tpu.render.params import RenderSettings, StaticConfig
from ipu_path_trace_tpu.render.wavefront import trace_sample_with_uniforms

W = H = 24  # 576 rays; not a multiple of the test block size (padding path)
BLOCK = 256


def _setup(max_path_length=6):
    scene = default_scene()
    cfg = StaticConfig(width=W, height=H, max_path_length=max_path_length)
    settings = RenderSettings.make(samples_per_step=1)
    work = make_worklist(W, H)
    cols = jnp.asarray(work["u"], jnp.float32)
    rows = jnp.asarray(work["v"], jnp.float32)
    rng = np.random.default_rng(11)
    p = cols.shape[0]
    aa = rng.normal(size=(2, p)).astype(np.float32)
    lens = rng.uniform(0.0, 1.0, size=(2, p)).astype(np.float32)
    uniforms = rng.uniform(0.0, 1.0, size=(max_path_length, 4, p)).astype(np.float32)
    return scene, cfg, settings, cols, rows, aa, lens, uniforms


def test_megakernel_matches_wavefront():
    scene, cfg, settings, cols, rows, aa, lens, uniforms = _setup()

    ref = trace_sample_with_uniforms(
        scene, settings, cfg, cols, rows,
        jnp.asarray(aa), jnp.asarray(lens), jnp.asarray(uniforms),
    )

    noise = np.concatenate(
        [aa, lens, uniforms.reshape(-1, cols.shape[0])], axis=0
    )  # (4 + 4L, P)
    out = trace_sample_pallas(
        scene, settings, cols, rows, noise=jnp.asarray(noise),
        width=W, height=H, max_path_length=cfg.max_path_length,
        aa_noise_type=cfg.aa_noise_type, block_size=BLOCK, interpret=True,
    )

    for name in ("x", "y", "z"):
        np.testing.assert_allclose(
            np.asarray(getattr(out.radiance, name)),
            np.asarray(getattr(ref.radiance, name)),
            rtol=1e-4, atol=3e-5, err_msg=f"radiance.{name}",
        )
        np.testing.assert_allclose(
            np.asarray(getattr(out.esc_w, name)),
            np.asarray(getattr(ref.esc_w, name)),
            rtol=1e-4, atol=3e-5, err_msg=f"esc_w.{name}",
        )
        np.testing.assert_allclose(
            np.asarray(getattr(out.esc_dir, name)),
            np.asarray(getattr(ref.esc_dir, name)),
            rtol=1e-4, atol=3e-5, err_msg=f"esc_dir.{name}",
        )
    np.testing.assert_array_equal(np.asarray(out.escaped), np.asarray(ref.escaped))
    np.testing.assert_array_equal(np.asarray(out.path_len), np.asarray(ref.path_len))


def test_megakernel_every_material_reached():
    """The default scene exercises diffuse, specular, refractive, and
    emissive objects plus escapes; make sure the kernel actually hits all
    of them (guards against a select chain that never selects)."""
    scene, cfg, settings, cols, rows, aa, lens, uniforms = _setup()
    noise = np.concatenate([aa, lens, uniforms.reshape(-1, cols.shape[0])], axis=0)
    out = trace_sample_pallas(
        scene, settings, cols, rows, noise=jnp.asarray(noise),
        width=W, height=H, max_path_length=cfg.max_path_length,
        aa_noise_type=cfg.aa_noise_type, block_size=BLOCK, interpret=True,
    )
    assert bool(jnp.any(out.escaped))
    assert bool(jnp.any(~out.escaped))
    assert int(jnp.max(out.path_len)) >= 2
    assert np.isfinite(np.asarray(out.radiance.x)).all()


def test_megakernel_dof_parity_and_focus():
    """With a non-zero aperture the kernel must still match the XLA
    uniforms driver, and rays must converge on the focus plane: for any
    lens sample, o + d*t hits the pinhole ray's focus point."""
    scene, cfg, settings, cols, rows, aa, lens, uniforms = _setup()
    settings = settings._replace(
        aperture=jnp.float32(0.3), focal_distance=jnp.float32(2.0)
    )
    ref = trace_sample_with_uniforms(
        scene, settings, cfg, cols, rows,
        jnp.asarray(aa), jnp.asarray(lens), jnp.asarray(uniforms),
    )
    noise = np.concatenate([aa, lens, uniforms.reshape(-1, cols.shape[0])], axis=0)
    out = trace_sample_pallas(
        scene, settings, cols, rows, noise=jnp.asarray(noise),
        width=W, height=H, max_path_length=cfg.max_path_length,
        aa_noise_type=cfg.aa_noise_type, block_size=BLOCK, interpret=True,
    )
    for name in ("x", "y", "z"):
        np.testing.assert_allclose(
            np.asarray(getattr(out.radiance, name)),
            np.asarray(getattr(ref.radiance, name)),
            rtol=1e-4, atol=3e-5, err_msg=f"dof radiance.{name}",
        )

    # Focus-plane convergence (geometry check on the lens helper):
    from ipu_path_trace_tpu.core.camera import pixel_to_ray
    from ipu_path_trace_tpu.render.wavefront import apply_thin_lens

    d0 = pixel_to_ray(cols, rows, W, H, settings.fov).normalized()
    o, d = apply_thin_lens(d0, settings, jnp.asarray(lens[0]), jnp.asarray(lens[1]))
    t = jnp.asarray(2.0) / (-d.z)  # param along the new ray to z = -2
    hit_x = np.asarray(o.x + d.x * t)
    hit_y = np.asarray(o.y + d.y * t)
    t0 = 2.0 / (-np.asarray(d0.z))
    np.testing.assert_allclose(hit_x, np.asarray(d0.x) * t0, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(hit_y, np.asarray(d0.y) * t0, rtol=1e-4, atol=1e-5)


def test_pinhole_bit_exact_when_aperture_zero():
    """aperture=0 must leave (o, d) untouched so exact-replay oracle
    parity is preserved."""
    from ipu_path_trace_tpu.core.camera import pixel_to_ray
    from ipu_path_trace_tpu.render.wavefront import apply_thin_lens
    from ipu_path_trace_tpu.render.params import RenderSettings

    settings = RenderSettings.make()
    cols = jnp.linspace(0.0, 23.0, 24)
    rows = jnp.linspace(0.0, 23.0, 24)
    d0 = pixel_to_ray(cols, rows, W, H, settings.fov).normalized()
    lens = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 24)).astype(np.float32))
    o, d = apply_thin_lens(d0, settings, lens[0], lens[1])
    assert np.all(np.asarray(o.x) == 0) and np.all(np.asarray(o.y) == 0)
    for c in "xyz":
        np.testing.assert_array_equal(
            np.asarray(getattr(d, c)), np.asarray(getattr(d0, c))
        )


def test_megakernel_scene_without_discs():
    """Scenes with an empty object class must not crash the kernel
    (zero-width SMEM tables pack as dummies)."""
    from ipu_path_trace_tpu.core.scene import Material, make_scene

    scene = make_scene(
        spheres=[((0.0, 0.0, -3.0), 1.0)],
        discs=[],
        colours=[(0.8, 0.2, 0.2)],
        emissions=[(0.0, 0.0, 0.0)],
        materials=[Material.DIFFUSE],
    )
    _, cfg, settings, cols, rows, aa, lens, uniforms = _setup()
    noise = np.concatenate([aa, lens, uniforms.reshape(-1, cols.shape[0])], axis=0)
    out = trace_sample_pallas(
        scene, settings, cols, rows, noise=jnp.asarray(noise),
        width=W, height=H, max_path_length=cfg.max_path_length,
        aa_noise_type=cfg.aa_noise_type, block_size=BLOCK, interpret=True,
    )
    ref = trace_sample_with_uniforms(
        scene, settings, cfg, cols, rows,
        jnp.asarray(aa), jnp.asarray(lens), jnp.asarray(uniforms),
    )
    np.testing.assert_allclose(
        np.asarray(out.radiance.x), np.asarray(ref.radiance.x),
        rtol=1e-4, atol=3e-5,
    )
    np.testing.assert_array_equal(np.asarray(out.escaped), np.asarray(ref.escaped))
