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


@pytest.mark.quick
def test_fake_quant_matches_int_chain(small_nif):
    """The QAT fake-quant forward (models/quant.fake_quant_apply) must
    BE the inference quantiser: evaluated (no gradient) with the same
    activation grids, it matches the integer chain to f32-rounding of
    the factored-out scales (the integer sums themselves are exact in
    f32 below 2^24)."""
    from ipu_path_trace_tpu.models.nif import fourier_features
    from ipu_path_trace_tpu.models.quant import fake_quant_apply

    weights, meta = small_nif
    amax = None
    from ipu_path_trace_tpu.models.quant import (
        _f32_chain_activations,
        calibration_features,
    )
    amax = tuple(_f32_chain_activations(
        weights, calibration_features(meta.embedding_dimension, (64, 128))))
    qp = quantize_nif(weights, meta, amax=amax)

    u, v = _uv(600, seed=21)
    params = [
        (jnp.asarray(l.kernel, jnp.float32),
         jnp.asarray(l.bias, jnp.float32))
        for l in weights.layers
    ]
    feats = fourier_features(u, v, meta.embedding_dimension)
    fq = np.asarray(fake_quant_apply(params, feats, 2, amax))  # (P, 3)
    twin = np.asarray(quant_mlp_t(qp, u, v)).T  # pre-decode (P, 3)
    # fourier_features (direct sin) vs the kernels' double-angle encode
    # differ by up to ~0.005 - below one int8 step (1/127) but enough to
    # flip the round() on a sliver of features.  On rows where the two
    # encodes quantise identically the chains agree to f32 rounding of
    # the factored-out scales; overall the flips stay rare.
    from ipu_path_trace_tpu.ops.nif_pallas import nif_encode

    f_kern = np.asarray(
        nif_encode(u, v, meta.embedding_dimension, jnp.float32)).T
    q_train = np.clip(np.round(np.asarray(feats) * 127), -127, 127)
    q_kern = np.clip(np.round(f_kern * 127), -127, 127)
    same = (q_train == q_kern).all(axis=1)
    assert same.mean() > 0.8
    # Even on grid-matched rows the two paths fold the scales in a
    # different order (fake-quant dequantises per element, inference
    # multiplies the integer accumulator once), so ulp-level input
    # differences can flip a requant tie mid-chain.  Bound the flip
    # FREQUENCY tightly on those rows and the median everywhere.
    rel_same = (np.abs(fq - twin) /
                (np.abs(twin) + 1e-2 * np.abs(twin).max()))[same]
    assert np.median(rel_same) < 1e-5
    assert (rel_same > 1e-2).mean() < 0.01
    rel = np.abs(fq - twin) / (np.abs(twin) + 1e-2 * np.abs(twin).max())
    assert np.median(rel) < 1e-3


def test_qat_finetune_smoke(small_nif):
    """A short QAT run returns same-shaped weights, finite loss, the
    calibration grids it trained against, and moves the weights."""
    from ipu_path_trace_tpu.models.quant import qat_finetune
    from ipu_path_trace_tpu.models.synth_env import resolve_synth

    weights, meta = small_nif
    img = resolve_synth("synth:urban-alley:64x128:seed3")
    new_w, amax, loss = qat_finetune(
        weights, meta, img, epochs=2, batch_size=2048,
        train_samples=4096, calib_grid=(32, 64), seed=5)
    assert np.isfinite(loss)
    assert len(amax) == len(weights.layers) - 1 and all(a > 0 for a in amax)
    for old, new in zip(weights.layers, new_w.layers):
        assert new.kernel.shape == old.kernel.shape
        assert not np.array_equal(new.kernel, old.kernel)
    # The fine-tuned net still quantises through the same pipeline.
    qp = quantize_nif(new_w, meta, amax=amax)
    u, v = _uv(128, seed=1)
    assert np.isfinite(np.asarray(nif_apply_quant(qp, u, v))).all()


@pytest.mark.quick
def test_env_shade_pallas_quant(small_nif, small_quant):
    """Fused escape-shade kernel (equirect -> int8 NIF -> weights) vs
    the XLA quant twin on random escape directions."""
    from ipu_path_trace_tpu.core.vecmath import Vec3
    from ipu_path_trace_tpu.ops.nif_pallas import nif_env_shade_pallas

    qp = small_quant
    rng = np.random.default_rng(33)
    p = 700
    d = rng.normal(size=(3, p)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    wgt = rng.uniform(0, 1, size=(3, p)).astype(np.float32)
    esc_dir = Vec3(*(jnp.asarray(r) for r in d))
    esc_w = Vec3(*(jnp.asarray(r) for r in wgt))
    az = jnp.float32(0.7)

    got = nif_env_shade_pallas(qp, esc_dir, esc_w, az,
                               block_size=256, interpret=True)
    # Twin uses the KERNEL's equirect (ops/nif_pallas.equirect_from_dir):
    # core/envmap.equirect_uv agrees only to ~6e-7, and int8 feature
    # rounding amplifies that into whole-step flips on a few lanes.
    from ipu_path_trace_tpu.ops.nif_pallas import equirect_from_dir

    u, v = equirect_from_dir(esc_dir.x, esc_dir.y, esc_dir.z, az)
    env = np.asarray(nif_apply_quant(qp, u, v))  # (P, 3) bgr
    ref = np.stack([wgt[0] * env[:, 2], wgt[1] * env[:, 1],
                    wgt[2] * env[:, 0]])
    out = np.stack([np.asarray(got.x), np.asarray(got.y), np.asarray(got.z)])
    rel = np.abs(out - ref) / (np.abs(ref) + 1e-2 * np.abs(ref).max())
    # The kernel computes its equirect INSIDE the fused compile context;
    # 1-ulp polynomial differences flip an int8 feature step on ~0.4% of
    # lanes, and a random He-init net amplifies a flipped input feature
    # to ~0.2 relative.  Bound the flip FREQUENCY, not the worst lane.
    assert np.median(rel) < 1e-3
    assert (rel > 1e-2).mean() < 0.01
    assert rel.max() < 0.5


def test_megastep_quant_matches_xla_chain(small_nif, small_quant):
    """The fused megastep with QuantNifParams (--nif-precision int8)
    against the XLA chain evaluating the SAME int8 net - host-noise +
    interpret mode, mirroring test_megastep.test_megastep_matches_xla_chain."""
    from ipu_path_trace_tpu.core.records import make_worklist
    from ipu_path_trace_tpu.core.scene import default_scene
    from ipu_path_trace_tpu.ops.megastep_pallas import render_megastep_pallas
    from ipu_path_trace_tpu.render.params import RenderSettings, StaticConfig
    from ipu_path_trace_tpu.render.wavefront import trace_sample_with_uniforms

    W = H = 24
    SAMPLES, MAXLEN = 2, 4
    qp = small_quant
    scene = default_scene()
    cfg = StaticConfig(width=W, height=H, max_path_length=MAXLEN)
    settings = RenderSettings.make(samples_per_step=SAMPLES)
    work = make_worklist(W, H)
    cols = jnp.asarray(work["u"], jnp.float32)
    rows = jnp.asarray(work["v"], jnp.float32)
    rng = np.random.default_rng(7)
    p = cols.shape[0]
    noise = rng.uniform(0, 1, size=(SAMPLES, 4 + 4 * MAXLEN, p)).astype(np.float32)
    noise[:, 0:2] = rng.normal(size=(SAMPLES, 2, p))

    rad = np.zeros((3, p), np.float32)
    plen = np.zeros(p, np.int64)
    for s in range(SAMPLES):
        st = trace_sample_with_uniforms(
            scene, settings, cfg, cols, rows,
            jnp.asarray(noise[s, 0:2]), jnp.asarray(noise[s, 2:4]),
            jnp.asarray(noise[s, 4:].reshape(MAXLEN, 4, p)),
        )
        # Kernel-matching equirect (see test_env_shade_pallas_quant):
        from ipu_path_trace_tpu.ops.nif_pallas import equirect_from_dir

        u, v = equirect_from_dir(st.esc_dir.x, st.esc_dir.y, st.esc_dir.z,
                                 settings.azimuth)
        u = jnp.where(st.escaped, u, 0.0)
        v = jnp.where(st.escaped, v, 0.0)
        out = np.asarray(nif_apply_quant(qp, u, v))  # (P, 3) bgr
        rad[0] += np.asarray(st.radiance.x) + np.asarray(st.esc_w.x) * out[:, 2]
        rad[1] += np.asarray(st.radiance.y) + np.asarray(st.esc_w.y) * out[:, 1]
        rad[2] += np.asarray(st.radiance.z) + np.asarray(st.esc_w.z) * out[:, 0]
        plen += np.asarray(st.path_len, np.int64)

    out = render_megastep_pallas(
        scene, settings, qp, cols, rows, noise=jnp.asarray(noise),
        width=W, height=H, max_path_length=MAXLEN,
        aa_noise_type=cfg.aa_noise_type, block_size=256, interpret=True,
    )
    got = np.stack([np.asarray(out.radiance.x), np.asarray(out.radiance.y),
                    np.asarray(out.radiance.z)])
    flipped = np.asarray(out.path_len) != plen
    assert flipped.mean() < 5e-3, f"{flipped.sum()} flipped lanes"
    ok = ~flipped
    scale = np.abs(rad).max()
    rel = (np.abs(got - rad) / (np.abs(rad) + 1e-2 * scale))[:, ok]
    assert np.median(rel) < 5e-3
    assert rel.max() < 8e-2


@pytest.mark.quick
def test_app_nif_precision_int8(tmp_path):
    """--nif-precision int8 end-to-end: the app loads the asset into a
    QuantNifParams env (honouring a QAT quant_amax.json sidecar) and a
    step produces finite radiance."""
    import json as _json
    import os

    from ipu_path_trace_tpu.models.quant import QuantNifParams
    from ipu_path_trace_tpu.models.train_nif import save_assets
    from ipu_path_trace_tpu.runtime.app import PathTracerApp
    from ipu_path_trace_tpu.runtime.config import Config

    weights, meta = make_synthetic_nif(key=3, hidden=32, num_hidden=2,
                                       skip_layer=1)
    assets = str(tmp_path / "nif_assets")
    save_assets(assets, weights, meta, ["synthetic"])
    amax = [2.5, 1.25]
    with open(os.path.join(assets, "quant_amax.json"), "w") as f:
        _json.dump({"amax": amax, "calibration_grid": "32x64"}, f)

    cfg = Config(
        outfile=str(tmp_path / "int8.png"), assets=assets,
        width=32, height=16, samples=2, samples_per_step=2,
        save_interval=1, seed=5, max_path_length=3,
        pallas_interpret=2, nif_precision="int8",
    )
    cfg.validate()
    app = PathTracerApp(cfg)
    app.init()
    assert isinstance(app.env.params, QuantNifParams)
    # The sidecar grids, not a fresh calibration, set the requant steps
    # (asymmetric activation grid: 255/a, models/quant.py):
    np.testing.assert_allclose(
        np.asarray(app.env.params.inv_next)[:-1],
        [255.0 / a for a in amax], rtol=1e-6)
    app.build()
    app.execute()
    hdr = app.film.hdr_at_step(1)
    assert np.isfinite(hdr).all()
    assert (hdr >= 0).all()


@pytest.mark.quick
def test_cli_nif_precision_flag(tmp_path):
    """--nif-precision parses and lands in Config; bad values rejected."""
    from ipu_path_trace_tpu.runtime.cli import parse_config

    argv = ["--assets", "a", "--outfile", str(tmp_path / "o.png"),
            "--nif-precision", "int8"]
    cfg = parse_config(argv)
    assert cfg.nif_precision == "int8"
    cfg = parse_config(argv[:-2] + ["--nif-precision", "auto"])
    assert cfg.nif_precision == "auto"
    with pytest.raises(SystemExit):
        parse_config(argv[:-1] + ["fp4"])


def test_calibration_covers_domain(small_nif):
    """Activation scales from the UV lattice bound the activations seen
    on random UVs: requantisation never saturates more than the odd
    near-max lane (the input domain IS the lattice's domain)."""
    weights, meta = small_nif
    qp = quantize_nif(weights, meta, grid=(64, 128))
    u, v = _uv(4000, seed=17)
    x = quant_mlp_t(qp, u, v)
    assert np.isfinite(np.asarray(x)).all()
