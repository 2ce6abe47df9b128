"""int8 NIF quantization: PTQ correctness, MXU-tile padding exactness,
and Pallas-kernel parity.

The quant scheme (models/quant.py) is symmetric per-output-channel int8
weights, constant-scale features, lattice-calibrated activation scales.
Three layers of evidence:

* the integer chain on packed (tile-padded) operands is BITWISE the
  unpadded XLA twin given the same int8 features - zero padding never
  changes an integer accumulator;
* the fused Pallas kernel (ops/nif_pallas.py) matches the XLA twin to
  the feature-quantisation tolerance: the f32 Fourier encode is
  compile-context-sensitive at 1 ulp/octave (FMA contraction under the
  chaotic double-angle map), so features may flip one int8 step between
  contexts - same budget as the bf16 parity tests;
* the quantised net tracks the f32 net to calibration accuracy (the
  real quality gate is trained on-class PSNR, docs/QUANT.json).

Reference analog: the fp16-weights / half-partials precision-for-speed
discipline of PathTracerApp.cpp:140-145,821-822, taken one step further.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ipu_path_trace_tpu.models.nif import make_params, make_synthetic_nif, nif_apply
from ipu_path_trace_tpu.models.quant import (
    QMAX,
    nif_apply_quant,
    quant_layer_t,
    quant_mlp_t,
    quantize_nif,
)
from ipu_path_trace_tpu.ops.nif_pallas import (
    _pack_scal_q,
    _zpad_rows,
    nif_apply_pallas_t,
    nif_encode,
    pack_quant_operands,
)


def _uv(n, seed=3):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.uniform(0, 1, n), jnp.float32),
            jnp.asarray(rng.uniform(0, 1, n), jnp.float32))


@pytest.fixture(scope="module")
def small_nif():
    weights, meta = make_synthetic_nif(key=7, hidden=64, num_hidden=4,
                                       skip_layer=2)
    meta.log_tone_map = True
    return weights, meta


@pytest.fixture(scope="module")
def small_quant(small_nif):
    weights, meta = small_nif
    return quantize_nif(weights, meta, grid=(64, 128))


@pytest.mark.quick
def test_quantize_shapes_and_scales(small_nif, small_quant):
    weights, meta = small_nif
    qp = small_quant
    assert qp.skip_layer == 2
    assert qp.embedding_dim == meta.embedding_dimension
    for i, l in enumerate(weights.layers):
        assert qp.kernels[i].shape == l.kernel.shape
        assert qp.kernels[i].dtype == jnp.int8
        assert qp.mults[i].shape == (l.kernel.shape[1],)
    # Per-channel weight quantisation: every output channel uses the
    # full int8 range (absmax maps to +-127).
    for q in qp.kernels:
        assert int(jnp.abs(q).max(axis=0).min()) == 127
    # Requant steps: positive for hidden layers, sentinel 1 for the head.
    inv = np.asarray(qp.inv_next)
    assert (inv[:-1] > 0).all() and inv[-1] == 1.0
    # Skip-dot multiplier uses the constant feature scale 1/127.
    sw_skip = np.abs(np.asarray(weights.layers[2].kernel)).max(axis=0) / 127.0
    np.testing.assert_allclose(np.asarray(qp.mult_skip),
                               sw_skip / 127.0, rtol=1e-6)


@pytest.mark.quick
def test_packed_chain_bitwise_vs_twin(small_quant):
    """Zero padding to the MXU int8 tiles must not change a single
    integer accumulator: the packed chain == the unpadded twin, bitwise,
    when both consume the same int8 features."""
    qp = small_quant
    u, v = _uv(777)  # not a tile multiple anywhere
    twin = quant_mlp_t(qp, u, v)  # (3, P) pre-decode

    ws, bs, ms, mskip, skip = pack_quant_operands(qp)
    scal = _pack_scal_q(qp)
    feats_f = nif_encode(u, v, qp.embedding_dim, jnp.float32)
    feats = jnp.clip(jnp.round(feats_f * QMAX), -QMAX, QMAX).astype(jnp.int8)
    feats = _zpad_rows(feats, ws[0].shape[1])
    x = feats
    for i in range(len(ws)):
        rows = (ws[i].shape[1] - feats.shape[0]) if i == skip else ws[i].shape[1]
        x = quant_layer_t(_zpad_rows(x, rows), feats, ws[i], bs[i], ms[i],
                          mskip, scal[0, 8 + i],
                          is_last=i == len(ws) - 1, is_skip=i == skip)
    assert x.shape[0] == 8  # head padded to the i32 result tile
    assert jnp.array_equal(x[:3], twin)
    # Padded head rows are exactly zero (zero weights, zero bias):
    assert not np.asarray(x[3:]).any()


@pytest.mark.quick
def test_pallas_kernel_matches_twin(small_quant):
    """Fused kernel vs XLA twin, interpret mode.  The integer chain is
    identical by construction; the residual is the one-int8-step feature
    flip from the compile-context-sensitive encode (module docstring),
    so tolerance matches the bf16 parity budget."""
    qp = small_quant
    u, v = _uv(1000, seed=5)  # exercises the block-padding path
    twin = np.asarray(nif_apply_quant(qp, u, v))
    out = np.asarray(
        nif_apply_pallas_t(qp, u, v, block_size=256, interpret=True).T)
    assert out.shape == (1000, 3)
    rel = np.abs(out - twin) / (np.abs(twin) + 1e-2 * np.abs(twin).max())
    assert np.median(rel) < 1e-3  # most lanes bitwise-identical
    assert rel.max() < 8e-2


def test_pallas_kernel_no_skip():
    """skip_layer=None nets (mult_skip is a zero vector) through the
    same packed-kernel path."""
    weights, meta = make_synthetic_nif(key=3, hidden=48, num_hidden=3,
                                       skip_layer=None)
    qp = quantize_nif(weights, meta, grid=(32, 64))
    assert qp.skip_layer == -1
    u, v = _uv(500, seed=11)
    twin = np.asarray(nif_apply_quant(qp, u, v))
    out = np.asarray(
        nif_apply_pallas_t(qp, u, v, block_size=256, interpret=True).T)
    rel = np.abs(out - twin) / (np.abs(twin) + 1e-2 * np.abs(twin).max())
    assert rel.max() < 8e-2


@pytest.mark.quick
def test_quant_tracks_f32(small_nif, small_quant):
    """The int8 net approximates the f32 net to calibration accuracy.
    (The shipped quality gate is on-class PSNR at reference scale,
    scripts/quant_psnr.py -> docs/QUANT.json.)"""
    weights, meta = small_nif
    params = make_params(weights, meta, jnp.float32)
    u, v = _uv(2000, seed=9)
    ref = np.asarray(nif_apply(params, u, v))
    out = np.asarray(nif_apply_quant(small_quant, u, v))
    scale = np.abs(ref).max()
    rel = np.abs(out - ref) / (np.abs(ref) + 1e-2 * scale)
    assert np.median(rel) < 3e-2
    # Random He-init nets + log decode amplify the int8 noise far more
    # than trained NIFs do (those are gated on PSNR); loose max bound.
    assert rel.max() < 0.35


def test_calibration_covers_domain(small_nif):
    """Activation scales from the UV lattice bound the activations seen
    on random UVs: requantisation never saturates more than the odd
    near-max lane (the input domain IS the lattice's domain)."""
    weights, meta = small_nif
    qp = quantize_nif(weights, meta, grid=(64, 128))
    u, v = _uv(4000, seed=17)
    x = quant_mlp_t(qp, u, v)
    assert np.isfinite(np.asarray(x)).all()
