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
    uniforms = rng.uniform(0.0, 1.0, size=(max_path_length, 4, p)).astype(np.float32)
    return scene, cfg, settings, cols, rows, aa, uniforms


def test_megakernel_matches_wavefront():
    scene, cfg, settings, cols, rows, aa, uniforms = _setup()

    ref = trace_sample_with_uniforms(
        scene, settings, cfg, cols, rows, jnp.asarray(aa), jnp.asarray(uniforms)
    )

    noise = np.concatenate(
        [aa, uniforms.reshape(-1, cols.shape[0])], axis=0
    )  # (2 + 4L, P)
    out = trace_sample_pallas(
        scene, settings, cols, rows, jnp.asarray(noise),
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
    scene, cfg, settings, cols, rows, aa, uniforms = _setup()
    noise = np.concatenate([aa, uniforms.reshape(-1, cols.shape[0])], axis=0)
    out = trace_sample_pallas(
        scene, settings, cols, rows, jnp.asarray(noise),
        width=W, height=H, max_path_length=cfg.max_path_length,
        aa_noise_type=cfg.aa_noise_type, block_size=BLOCK, interpret=True,
    )
    assert bool(jnp.any(out.escaped))
    assert bool(jnp.any(~out.escaped))
    assert int(jnp.max(out.path_len)) >= 2
    assert np.isfinite(np.asarray(out.radiance.x)).all()
