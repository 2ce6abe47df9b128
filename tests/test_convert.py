"""SavedModel -> converted.hdf5 converter (models/convert.py).

TensorFlow is not installed, so these tests write a real TensorBundle
checkpoint (LevelDB-format index + raw data shard - the exact on-disk
format `tf.train.Checkpoint`/keras SavedModel produce) byte-by-byte
from the documented format, then drive the converter end-to-end:
SavedModel dir -> convert -> load_nif_assets -> inference parity with
the source weights.  The parity of the reference tool this mirrors:
src/keras/model_to_hdf5.py:22-25.
"""

import json
import os
import struct

import numpy as np
import jax.numpy as jnp
import pytest

from ipu_path_trace_tpu.models.convert import (
    _snappy_decompress, convert, read_tensor_bundle, saved_model_to_weights,
)
from ipu_path_trace_tpu.models.nif import (
    load_nif_assets, make_params, make_synthetic_nif, nif_apply,
)

# ---------------------------------------------------------------------------
# Minimal TensorBundle writer (the inverse of convert.py's reader)
# ---------------------------------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _snappy_compress(data: bytes) -> bytes:
    # Keep chunks < 60 bytes so every literal uses the 1-byte tag form:
    out = bytearray(_varint(len(data)))
    pos = 0
    while pos < len(data):
        chunk = data[pos:pos + 59]
        out.append((len(chunk) - 1) << 2)
        out += chunk
        pos += len(chunk)
    return bytes(out)


def _build_block(entries, restart_interval=2) -> bytes:
    """LevelDB table block: prefix-compressed entries + restart array."""
    buf = bytearray()
    restarts = []
    prev = b""
    for i, (key, value) in enumerate(entries):
        if i % restart_interval == 0:
            restarts.append(len(buf))
            shared = 0
        else:
            shared = 0
            while (shared < len(prev) and shared < len(key)
                   and prev[shared] == key[shared]):
                shared += 1
        buf += _varint(shared) + _varint(len(key) - shared) + _varint(len(value))
        buf += key[shared:] + value
        prev = key
    if not entries:
        restarts.append(0)
    for r in restarts:
        buf += struct.pack("<I", r)
    buf += struct.pack("<I", len(restarts))
    return bytes(buf)


def _shape_proto(shape) -> bytes:
    out = b""
    for d in shape:
        dim = b"\x08" + _varint(d)  # Dim.size = field 1 varint
        out += b"\x12" + _varint(len(dim)) + dim  # TensorShapeProto.dim = 2
    return out


def _bundle_entry(dtype, shape, offset, size) -> bytes:
    sp = _shape_proto(shape)
    return (b"\x08" + _varint(dtype)            # dtype = 1
            + b"\x12" + _varint(len(sp)) + sp   # shape = 2
            + b"\x20" + _varint(offset)         # offset = 4
            + b"\x28" + _varint(size))          # size = 5


def write_bundle(model_dir, tensors, *, compress=False, entries_per_block=2):
    """Write variables/variables.{index,data-00000-of-00001}.

    tensors: {checkpoint_key: np.ndarray} - written in sorted key order.
    """
    vdir = os.path.join(model_dir, "variables")
    os.makedirs(vdir, exist_ok=True)
    data = bytearray()
    kv = [(b"", b"\x08\x01")]  # BundleHeaderProto: num_shards = 1
    for key in sorted(tensors):
        arr = tensors[key]
        raw = arr.tobytes()
        dt = {np.dtype(np.float32): 1, np.dtype(np.float16): 19,
              np.dtype(np.float64): 2, np.dtype(np.int64): 9}[arr.dtype]
        kv.append((key.encode(), _bundle_entry(dt, arr.shape, len(data),
                                               len(raw))))
        data += raw
    with open(os.path.join(vdir, "variables.data-00000-of-00001"), "wb") as f:
        f.write(data)

    # Blocks of entries_per_block, then metaindex + index + footer:
    out = bytearray()
    index_entries = []
    for i in range(0, len(kv), entries_per_block):
        chunk = kv[i:i + entries_per_block]
        block = _build_block(chunk)
        if compress:
            block = _snappy_compress(block)
        handle = _varint(len(out)) + _varint(len(block))
        out += block + bytes([1 if compress else 0]) + b"\0\0\0\0"
        index_entries.append((chunk[-1][0], handle))
    meta_block = _build_block([])
    meta_handle = _varint(len(out)) + _varint(len(meta_block))
    out += meta_block + b"\0" + b"\0\0\0\0"
    index_block = _build_block(index_entries, restart_interval=1)
    index_handle = _varint(len(out)) + _varint(len(index_block))
    out += index_block + b"\0" + b"\0\0\0\0"
    footer = meta_handle + index_handle
    footer += b"\0" * (40 - len(footer))
    footer += struct.pack("<Q", 0xDB4775248B80FB57)
    out += footer
    with open(os.path.join(vdir, "variables.index"), "wb") as f:
        f.write(out)


def _fake_saved_model(tmp_path, *, compress=False, with_meta=True,
                      fp16=True, tf1_names=False):
    """A NIF-shaped keras SavedModel dir written without TensorFlow."""
    weights, meta = make_synthetic_nif(key=11, hidden=24, num_hidden=7,
                                       embedding_dim=4)
    model_dir = os.path.join(tmp_path, "saved_model")
    tensors = {}
    for i, l in enumerate(weights.layers):
        kdt = np.float16 if fp16 else np.float32
        if tf1_names:
            base = "dense" if i == 0 else f"dense_{i}"
            kkey, bkey = f"{base}/kernel", f"{base}/bias"
        else:
            kkey = f"layer_with_weights-{i}/kernel/.ATTRIBUTES/VARIABLE_VALUE"
            bkey = f"layer_with_weights-{i}/bias/.ATTRIBUTES/VARIABLE_VALUE"
        tensors[kkey] = l.kernel.astype(kdt)
        tensors[bkey] = l.bias.astype(np.float32)
    # Non-layer checkpoint noise the converter must skip:
    tensors["optimizer/iter/.ATTRIBUTES/VARIABLE_VALUE"] = np.zeros(
        1, np.int64)
    os.makedirs(model_dir, exist_ok=True)
    write_bundle(model_dir, tensors, compress=compress)
    open(os.path.join(model_dir, "saved_model.pb"), "wb").write(b"\x08\x01")
    if with_meta:
        extra = os.path.join(model_dir, "assets.extra")
        os.makedirs(extra, exist_ok=True)
        meta.save(os.path.join(extra, "nif_metadata.txt"),
                  ["train_nif.py", "--layer-size", "24"])
    return model_dir, weights, meta


# ---------------------------------------------------------------------------


def test_snappy_decompress_with_copies():
    # Hand-built stream: literal "abcdef" + overlapping copy(offset=3,
    # len=6) + copy2(offset=12, len=4) -> "abcdefdefdefabcd"
    ref = b"abcdef" + b"defdef" + b"abcd"
    stream = (_varint(len(ref))
              + bytes([(6 - 1) << 2]) + b"abcdef"        # literal 6
              + bytes([((6 - 4) << 2) | 1, 3])           # copy1 len6 off3
              + bytes([((4 - 1) << 2) | 2]) + b"\x0c\x00")  # copy2 len4 off12
    assert _snappy_decompress(stream) == ref


def test_read_tensor_bundle_roundtrip(tmp_path):
    model_dir, weights, _ = _fake_saved_model(str(tmp_path))
    entries = read_tensor_bundle(
        os.path.join(model_dir, "variables", "variables.index"))
    assert "layer_with_weights-0/kernel/.ATTRIBUTES/VARIABLE_VALUE" in entries
    e = entries["layer_with_weights-0/kernel/.ATTRIBUTES/VARIABLE_VALUE"]
    assert e["shape"] == weights.layers[0].kernel.shape
    assert e["dtype"] == 19  # DT_HALF


@pytest.mark.parametrize("compress", [False, True])
@pytest.mark.parametrize("tf1_names", [False, True])
def test_convert_end_to_end(tmp_path, compress, tf1_names):
    model_dir, weights, meta = _fake_saved_model(
        str(tmp_path), compress=compress, tf1_names=tf1_names)
    out_dir = os.path.join(str(tmp_path), "assets_out")
    convert(model_dir, out_dir)

    params, meta2, loaded = load_nif_assets(out_dir, jnp.float32)
    assert len(loaded.layers) == len(weights.layers)
    for a, b in zip(loaded.layers, weights.layers):
        np.testing.assert_array_equal(
            a.kernel, b.kernel.astype(np.float16).astype(np.float32))
    # Inference parity: converted assets reproduce the source network
    # (both sides fp16-rounded weights, f32 compute):
    src = make_synthetic_nif(key=11, hidden=24, num_hidden=7,
                             embedding_dim=4)[0]
    for l in src.layers:
        l.kernel = l.kernel.astype(np.float16).astype(np.float32)
        l.bias = l.bias.astype(np.float16).astype(np.float32)
    p_src = make_params(src, meta, jnp.float32)
    u = jnp.linspace(0.0, 1.0, 33)
    v = jnp.linspace(0.0, 1.0, 33)
    np.testing.assert_allclose(np.asarray(nif_apply(params, u, v)),
                               np.asarray(nif_apply(p_src, u, v)),
                               rtol=1e-5, atol=1e-6)
    assert meta2.embedding_dimension == meta.embedding_dimension


def test_convert_without_metadata_warns_but_writes(tmp_path):
    model_dir, _, _ = _fake_saved_model(str(tmp_path), with_meta=False)
    out_dir = os.path.join(str(tmp_path), "out")
    convert(model_dir, out_dir)
    assert os.path.exists(os.path.join(out_dir, "converted.hdf5"))
    assert not os.path.exists(os.path.join(out_dir, "nif_metadata.txt"))


def test_convert_rejects_non_dense(tmp_path):
    model_dir = os.path.join(str(tmp_path), "conv_model")
    os.makedirs(model_dir, exist_ok=True)
    write_bundle(model_dir, {
        "layer_with_weights-0/kernel/.ATTRIBUTES/VARIABLE_VALUE":
            np.zeros((3, 3, 8, 16), np.float32),  # a conv kernel
    })
    with pytest.raises(ValueError, match="rank 4"):
        saved_model_to_weights(model_dir)


def test_convert_missing_dir_errors(tmp_path):
    with pytest.raises(FileNotFoundError):
        saved_model_to_weights(os.path.join(str(tmp_path), "nope"))


def test_convert_cli(tmp_path):
    from ipu_path_trace_tpu.models.convert import main

    model_dir, _, _ = _fake_saved_model(str(tmp_path))
    out_dir = os.path.join(str(tmp_path), "cli_out")
    assert main([model_dir, out_dir]) == 0
    # The converted dir is directly consumable as --assets:
    meta = json.load(open(os.path.join(out_dir, "nif_metadata.txt")))
    assert meta["embedding_dimension"] == 4
    assert main([]) == 2
