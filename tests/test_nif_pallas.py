"""Parity of the fused Pallas NIF kernel vs. the XLA reference path.

Runs in Pallas interpret mode on the CPU backend (the TPU lowering is
exercised by bench.py / the driver on hardware).  The kernel encodes
Fourier features with a double-angle recurrence instead of 4E direct
transcendentals (ops/nif_pallas.py), so parity is to ~1e-3 relative -
below the bf16 quantisation of the weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipu_path_trace_tpu.models.nif import make_params, make_synthetic_nif, nif_apply
from ipu_path_trace_tpu.ops.nif_pallas import nif_apply_pallas, nif_apply_pallas_t


@pytest.mark.parametrize("skip_layer", [None, 3])
@pytest.mark.parametrize("log_tone_map", [True, False])
def test_pallas_matches_xla_f32(skip_layer, log_tone_map):
    """f32 weights isolate the kernel structure: only the double-angle
    recurrence differs from the XLA path, so parity is tight."""
    weights, meta = make_synthetic_nif(
        key=7, hidden=64, num_hidden=3, skip_layer=skip_layer
    )
    meta.log_tone_map = log_tone_map
    params = make_params(weights, meta, jnp.float32)

    rng = np.random.default_rng(3)
    p = 1000  # deliberately not a multiple of the block size (padding path)
    u = jnp.asarray(rng.uniform(0.0, 1.0, p), jnp.float32)
    v = jnp.asarray(rng.uniform(0.0, 1.0, p), jnp.float32)

    ref = np.asarray(nif_apply(params, u, v))
    out = np.asarray(
        nif_apply_pallas(params, u, v, block_size=256, interpret=True)
    )
    assert out.shape == (p, 3)
    # The double-angle recurrence loses ~1 bit/octave from f32 rounding:
    # feature error ~4e-3 at j=11, well under bf16 weight quantisation.
    # Relative metric uses a scale floor so near-zero outputs don't blow up.
    scale = np.abs(ref).max()
    rel = np.abs(out - ref) / (np.abs(ref) + 1e-2 * scale)
    assert rel.max() < 1.5e-2


def test_pallas_matches_xla_embedding16():
    """E=16 (the kernel-free embedding at width 192: skip-concat lands
    exactly on 256, zero MXU pad).  Four more double-angle octaves than
    the canonical E=12 - feature error grows ~1 bit/octave, still well
    inside the relative tolerance."""
    weights, meta = make_synthetic_nif(
        key=13, hidden=64, num_hidden=3, skip_layer=1, embedding_dim=16
    )
    assert weights.layers[0].kernel.shape[0] == 64  # 4E features
    params = make_params(weights, meta, jnp.float32)
    rng = np.random.default_rng(9)
    u = jnp.asarray(rng.uniform(0.0, 1.0, 700), jnp.float32)
    v = jnp.asarray(rng.uniform(0.0, 1.0, 700), jnp.float32)
    ref = np.asarray(nif_apply(params, u, v))
    out = np.asarray(nif_apply_pallas(params, u, v, block_size=256, interpret=True))
    scale = np.abs(ref).max()
    rel = np.abs(out - ref) / (np.abs(ref) + 1e-2 * scale)
    assert rel.max() < 2e-2


def test_pallas_matches_xla_mixed_widths():
    """Per-layer (mixed) widths: the MXU-shaped variable-width nets.

    Every inference path re-detects the skip-concat from layer shapes,
    so a width change mid-chain must flow through the Pallas kernel
    identically to the XLA path."""
    weights, meta = make_synthetic_nif(
        key=11, hidden=[64, 32, 48, 64], num_hidden=4, skip_layer=2
    )
    assert [l.kernel.shape for l in weights.layers] == [
        (48, 64), (64, 32), (32 + 48, 48), (48, 64), (64, 3)
    ]
    params = make_params(weights, meta, jnp.float32)
    rng = np.random.default_rng(6)
    u = jnp.asarray(rng.uniform(0.0, 1.0, 700), jnp.float32)
    v = jnp.asarray(rng.uniform(0.0, 1.0, 700), jnp.float32)
    ref = np.asarray(nif_apply(params, u, v))
    out = np.asarray(nif_apply_pallas(params, u, v, block_size=256, interpret=True))
    scale = np.abs(ref).max()
    rel = np.abs(out - ref) / (np.abs(ref) + 1e-2 * scale)
    assert rel.max() < 1.5e-2


def test_pallas_matches_xla_bf16():
    """bf16 weights: the two paths quantise features on opposite sides of
    a bf16 ulp, and the log decode exponentiates the gap - parity is to
    ~bf16 noise, the same budget the reference's fp16 encode lives in
    (NifModel.cpp:185-218)."""
    weights, meta = make_synthetic_nif(key=7, hidden=64, num_hidden=3)
    params = make_params(weights, meta, jnp.bfloat16)
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.uniform(0.0, 1.0, 1000), jnp.float32)
    v = jnp.asarray(rng.uniform(0.0, 1.0, 1000), jnp.float32)
    ref = np.asarray(nif_apply(params, u, v))
    out = np.asarray(nif_apply_pallas(params, u, v, block_size=256, interpret=True))
    rel = np.abs(out - ref) / (np.abs(ref) + 1e-6)
    assert np.median(rel) < 5e-3
    assert rel.max() < 8e-2


def test_pallas_t_is_channel_major():
    weights, meta = make_synthetic_nif(key=1, hidden=64, num_hidden=2, skip_layer=None)
    params = make_params(weights, meta, jnp.bfloat16)
    u = jnp.linspace(0.1, 0.9, 300)
    v = jnp.linspace(0.2, 0.8, 300)
    out_t = nif_apply_pallas_t(params, u, v, block_size=128, interpret=True)
    out = nif_apply_pallas(params, u, v, block_size=128, interpret=True)
    assert out_t.shape == (3, 300)
    np.testing.assert_allclose(np.asarray(out_t.T), np.asarray(out))


def test_env_shade_matches_xla_chain():
    """The fused equirect+NIF+apply kernel must match the XLA chain
    (equirect_uv -> mask -> nif_apply -> bgr flip -> esc_w multiply)."""
    from ipu_path_trace_tpu.core.envmap import equirect_uv
    from ipu_path_trace_tpu.core.vecmath import Vec3
    from ipu_path_trace_tpu.ops.nif_pallas import nif_env_shade_pallas

    weights, meta = make_synthetic_nif(key=5, hidden=64, num_hidden=3)
    params = make_params(weights, meta, jnp.bfloat16)
    rng = np.random.default_rng(9)
    p = 700
    d = rng.normal(size=(3, p)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    escaped = rng.uniform(size=p) < 0.8
    d[:, ~escaped] = 0.0
    w = rng.uniform(0.0, 2.0, size=(3, p)).astype(np.float32)
    w[:, ~escaped] = 0.0
    esc_dir = Vec3(*(jnp.asarray(d[i]) for i in range(3)))
    esc_w = Vec3(*(jnp.asarray(w[i]) for i in range(3)))
    azimuth = jnp.float32(0.7)

    u, v = equirect_uv(esc_dir, azimuth)
    u = jnp.where(jnp.asarray(escaped), u, 0.0)
    v = jnp.where(jnp.asarray(escaped), v, 0.0)
    out = nif_apply(params, u, v)
    ref = np.stack(
        [w[0] * np.asarray(out[:, 2]), w[1] * np.asarray(out[:, 1]), w[2] * np.asarray(out[:, 0])]
    )

    got = nif_env_shade_pallas(
        params, esc_dir, esc_w, azimuth, block_size=256, interpret=True
    )
    got = np.stack([np.asarray(got.x), np.asarray(got.y), np.asarray(got.z)])
    scale = np.abs(ref).max()
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-2 * scale)
    # bf16 feature quantisation noise + polynomial atan2, same budget as
    # the other kernel parity tests:
    assert np.median(rel) < 5e-3
    assert rel.max() < 8e-2
