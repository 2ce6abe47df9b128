"""NIF trainer + standalone reconstruction tool tests."""

import numpy as np
import pytest

from ipu_path_trace_tpu.models.nif import load_nif_assets, make_params, make_synthetic_nif
from ipu_path_trace_tpu.models.reconstruct import reconstruct_image, uv_grid
from ipu_path_trace_tpu.models.train_nif import encode_targets, save_assets, train_nif


def _test_image(h=32, w=64):
    """Smooth HDR gradient + a bright blob."""
    rows, cols = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
    img = np.stack(
        [0.2 + rows, 0.3 + 0.5 * cols, 1.5 - rows * cols], axis=-1
    ).astype(np.float32)
    img[h // 4 : h // 2, w // 4 : w // 2] *= 8.0  # HDR highlight
    return img


def test_encode_decode_inverse():
    img = _test_image()
    eps = 1e-8
    targets, mean, max_abs = encode_targets(img, eps, log_tone_map=True)
    assert np.abs(targets).max() <= 1.0 + 1e-6
    # Decode (the renderer's math, NifModel.cpp:221-245) must invert:
    decoded_bgr = np.exp(targets * max_abs + (mean - eps))
    assert np.allclose(decoded_bgr[..., ::-1], img, rtol=1e-4, atol=1e-5)


def test_train_and_roundtrip(tmp_path):
    """Train a tiny NIF, write reference-format assets, reload, reconstruct."""
    img = _test_image()
    weights, meta, loss = train_nif(
        img,
        layer_size=64,
        layer_count=3,
        embedding_dim=8,
        skip_layer=None,
        epochs=300,
        batch_size=2048,
        learning_rate=3e-3,
        seed=1,
    )
    assert loss < 0.01, f"training failed to converge: loss={loss}"
    out = str(tmp_path / "assets.extra")
    save_assets(out, weights, meta, ["train_nif.py", "--layer-size", "64"])

    # Reload through the assets-dir loader (reference schema):
    params, meta2, _ = load_nif_assets(out)
    assert meta2.hidden_size == 64
    recon = reconstruct_image(params, img.shape[0], img.shape[1], max_batch_size=512)
    # bf16 inference of a converged model: a few percent relative error
    rel = np.abs(recon - img) / (np.abs(img) + 0.1)
    assert np.median(rel) < 0.15, f"median rel err {np.median(rel)}"


def test_trainer_cli_records_replayable_command(tmp_path):
    """The trainer CLI's own recorded train_command must parse back
    through build_parser() and carry every weight-shaping knob, so a
    CLI-trained asset is reproducible (same contract the shipped assets
    are held to in tests/test_shipped_assets.py)."""
    from ipu_path_trace_tpu.film.imageio import write_exr
    from ipu_path_trace_tpu.models.train_nif import build_parser, main

    src = str(tmp_path / "tiny.exr")
    write_exr(src, _test_image(8, 16))
    out = str(tmp_path / "cli_assets")
    assert main([src, out, "--layer-size", "64", "--layer-count", "3",
                 "--embedding-dimension", "8", "--skip-layer", "1",
                 "--epochs", "3", "--batch-size", "64", "--seed", "7",
                 "--cosine-decay"]) == 0

    import json
    import os

    meta = json.load(open(os.path.join(out, "nif_metadata.txt")))
    cmd = meta["train_command"]
    assert cmd[:3] == ["python", "-m", "ipu_path_trace_tpu.models.train_nif"]
    args = build_parser().parse_args(cmd[3:])
    assert (args.input, args.out_dir) == (src, out)
    assert args.layer_size == 64 and args.layer_count == 3
    assert args.embedding_dimension == 8 and args.skip_layer == 1
    assert args.epochs == 3
    assert args.batch_size == 64 and args.seed == 7 and args.cosine_decay
    # The reference scrapes --layer-size from this command
    # (NifMetaData.cpp:56-64); the loader must see the same width:
    _, meta2, _ = load_nif_assets(out)
    assert meta2.hidden_size == 64


def test_train_mixed_widths_roundtrip(tmp_path):
    """Mixed per-layer widths survive the train -> save -> load cycle and
    keep the skip-concat at the declared layer (shapes are the contract
    every inference path re-detects the skip from)."""
    img = _test_image()
    widths = [48, 32, 16, 48]
    weights, meta, loss = train_nif(
        img,
        layer_size=widths,
        layer_count=4,
        embedding_dim=4,
        skip_layer=2,
        epochs=60,
        batch_size=2048,
        learning_rate=3e-3,
        seed=2,
    )
    in_dim = 4 * 4
    assert [l.kernel.shape for l in weights.layers] == [
        (in_dim, 48), (48, 32), (32 + in_dim, 16), (16, 48), (48, 3)
    ]
    out = str(tmp_path / "assets.extra")
    save_assets(out, weights, meta,
                ["train_nif.py", "--layer-sizes", "48,32,16,48"])
    params, meta2, weights2 = load_nif_assets(out)
    assert [l.kernel.shape for l in weights2.layers] == [
        l.kernel.shape for l in weights.layers
    ]
    recon = reconstruct_image(params, img.shape[0], img.shape[1], max_batch_size=512)
    assert recon.shape == img.shape
    assert np.isfinite(recon).all()


def test_uv_grid_matches_reference():
    u, v = uv_grid(4, 8)
    # Row-major: first 8 entries are row 0 (NifModel.cpp:481-487):
    assert np.allclose(u[:8], 0.0)
    assert np.allclose(v[:8], np.arange(8) / 8.0)
    assert np.allclose(u[8], 1 / 4.0)


def test_reconstruct_batch_serialisation():
    weights, meta = make_synthetic_nif(key=7, hidden=32, num_hidden=2, embedding_dim=4)
    params = make_params(weights, meta)
    img1 = reconstruct_image(params, 16, 24, max_batch_size=1000)  # forces factor>1
    img2 = reconstruct_image(params, 16, 24, max_batch_size=10**9)
    assert img1.shape == (16, 24, 3)
    assert np.allclose(img1, img2, rtol=1e-5, atol=1e-6)
