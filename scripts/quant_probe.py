"""Low-precision MXU probe: the NIF matmul chain at int8 / fp8 vs bf16.

Round-5 headline lever (VERDICT r4 #1): the megastep is ~84% NIF matmul
already running at >=91% of the v5e's *bf16* roofline (docs/PERF.md), so
the only remaining big arithmetic lever is the MXU's narrow modes - the
v5e datasheet doubles peak throughput at int8 (394 vs 197 TOPS).  This
probe measures whether that speedup actually materialises through
Mosaic for the NIF's shapes, and what the requantisation VPU work costs,
BEFORE any quality work is spent (reference analog: the fp16-weights /
half-partials precision-for-speed discipline of PathTracerApp.cpp:140-145).

Variants (all feature-major (out,in) x (in,B) like ops/nif_pallas.py):

  bf16         production arithmetic: bf16 x bf16 -> f32 dot, f32 bias+relu
  int8_requant correctness-shaped int8: per-layer static scales, i32
               accumulate, f32 bias+relu on the VPU, round+clip requant;
               the skip layer runs as two dots so the trunk and the
               Fourier features keep their own scales
  int8_raw     optimistic bound: int8 dots, plain cast between layers
               (no scales/round) - isolates the MXU mode speed from the
               requant cost
  fp8_e4m3     fp8 x fp8 -> f32 dot, per-layer scale, cast back to fp8
  fp8_raw      fp8 dots, plain cast back (optimistic bound)

Each variant runs the canonical 6x320 E=12 chain over 1104x1000 rays
(540 blocks of 2048, the megastep block size) and reports ms per
full-frame sample - directly comparable to the ~7.5 ms NIF phase of the
production stub split (docs/PERF.md "Where the time goes").  Narrow
variants pad contraction dims to 32 (Mosaic's int8/fp8 sublane tile);
that work is free on hardware (contraction pads to the MXU's 128 rows
regardless), so the comparison is apples-to-apples.  A quick relative
error figure vs the f32 chain on the same random weights gives the
first quality signal (the real gate is trained on-class PSNR).

Usage:  python scripts/quant_probe.py [--variants bf16,int8_requant,...]
Writes docs/QUANT.json.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

WIDTH, HEIGHT = 1104, 1000
BLOCK = 2048
EMBED = 12
FEAT = 4 * EMBED  # 48
HIDDEN = 320
SKIP = 3  # layer whose input concatenates the Fourier features
NLAYERS = 7  # 6 hidden + head


def chain_dims(pad_to: int | None = None):
    """[(in, out)] per layer.  pad_to pads *contraction* dims up -
    identical MXU work (contraction pads to the 128 systolic rows
    regardless) but satisfies Mosaic's (32, 128) int8/fp8 tiling for the
    48- and 368-wide inputs.  The head widens to out=8 when padding (i32
    result sublane tile)."""
    rup = lambda x: x if pad_to is None else -(-x // pad_to) * pad_to
    dims = []
    cur = FEAT
    for i in range(6):
        inw = cur + FEAT if i == SKIP else cur
        dims.append((rup(inw), HIDDEN))
        cur = HIDDEN
    dims.append((rup(cur), 3 if pad_to is None else 8))
    return dims


def make_weights(rng: np.random.Generator, pad_to: int | None):
    """f32 (out, in) weights + (out, 1) biases, He-scaled.  Padded
    contraction columns are ZERO so every variant computes the same
    function."""
    ws, bs = [], []
    cur = FEAT
    for i, (inw, outw) in enumerate(chain_dims(pad_to)):
        real_in = (cur + FEAT) if i == SKIP else cur
        w = np.zeros((outw, inw), np.float32)
        w[:, :real_in] = rng.standard_normal(
            (outw, real_in), dtype=np.float32) * np.sqrt(2.0 / real_in)
        ws.append(w)
        bs.append(rng.standard_normal((outw, 1), dtype=np.float32) * 0.01)
        cur = outw if i < 6 else cur
    return ws, bs


def encode_np(u, v):
    """f32 Fourier features (4E, B) - NumPy twin of nif_encode."""
    uu, vv = 2.0 * (u - 1.0), 2.0 * (v - 1.0)
    su, cu = np.sin(uu), np.cos(uu)
    sv, cv = np.sin(vv), np.cos(vv)
    sus, cus, svs, cvs = [su], [cu], [sv], [cv]
    for _ in range(EMBED - 1):
        s, c = sus[-1], cus[-1]
        sus.append(2.0 * s * c)
        cus.append(1.0 - 2.0 * s * s)
        s, c = svs[-1], cvs[-1]
        svs.append(2.0 * s * c)
        cvs.append(1.0 - 2.0 * s * s)
    return np.stack(sus + svs + cus + cvs, axis=0).astype(np.float32)


def f32_chain_np(ws, bs, feats):
    """Reference f32 forward on the host; returns (out, B) and the
    per-layer *input* activations (for calibration)."""
    x = feats
    inputs = []
    for i, (w, b) in enumerate(zip(ws, bs)):
        if i == SKIP:
            x = np.concatenate([x, feats], axis=0)
        if x.shape[0] < w.shape[1]:
            x = np.pad(x, ((0, w.shape[1] - x.shape[0]), (0, 0)))
        inputs.append(x)
        y = w @ x + b
        if i < len(ws) - 1:
            y = np.maximum(y, 0.0)
        x = y
    return x, inputs


# ---------------------------------------------------------------- kernels

def _zpad(x, rows):
    if x.shape[0] >= rows:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((rows - x.shape[0], x.shape[1]), x.dtype)], axis=0)


def _bf16_kernel(num_layers, feats_ref, *refs):
    ws = refs[:num_layers]
    bs = refs[num_layers:2 * num_layers]
    out_ref = refs[2 * num_layers]
    feats = feats_ref[:].astype(jnp.bfloat16)
    x = feats
    for i in range(num_layers):
        w = ws[i][:]
        if i == SKIP:
            x = jnp.concatenate([x, feats], axis=0)
        y = jnp.dot(w, x, preferred_element_type=jnp.float32)
        y = y + bs[i][:]
        if i < num_layers - 1:
            x = jnp.maximum(y, 0.0).astype(jnp.bfloat16)
        else:
            x = y
    out_ref[:] = x


def _int8_perchan_kernel(num_layers, feats_ref, scal_ref, *refs):
    """Per-output-channel weight scales: the accumulator multiplier is a
    (out, 1) VMEM vector per layer instead of a scalar - the broadcast
    multiply costs the VPU the same either way, so this should time like
    int8_requant while roughly halving weight quantisation error."""
    ws = refs[:num_layers]
    bs = refs[num_layers:2 * num_layers]
    ms = refs[2 * num_layers:3 * num_layers]      # (out, 1) trunk multipliers
    mf = refs[3 * num_layers]                     # (out, 1) skip-dot multiplier
    out_ref = refs[3 * num_layers + 1]
    dn = (((1,), (0,)), ((), ()))
    feats = feats_ref[:]
    x = feats
    for i in range(num_layers):
        w = ws[i][:]
        if i == SKIP:
            trunk_cols = w.shape[1] - feats.shape[0]
            acc = jax.lax.dot_general(w[:, :trunk_cols], _zpad(x, trunk_cols),
                                      dn, preferred_element_type=jnp.int32)
            accf = jax.lax.dot_general(w[:, trunk_cols:], feats, dn,
                                       preferred_element_type=jnp.int32)
            y = (acc.astype(jnp.float32) * ms[i][:]
                 + accf.astype(jnp.float32) * mf[:] + bs[i][:])
        else:
            acc = jax.lax.dot_general(w, _zpad(x, w.shape[1]), dn,
                                      preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * ms[i][:] + bs[i][:]
        if i < num_layers - 1:
            y = jnp.maximum(y, 0.0)
            q = jnp.clip(jnp.round(y * scal_ref[0, 3 * i + 1]), -127.0, 127.0)
            x = q.astype(jnp.int8)
        else:
            x = y
    out_ref[:] = x


def _narrow_kernel(num_layers, requant, qdtype, feats_ref, scal_ref, *refs):
    """int8 / fp8 chain.  scal_ref (1, 3L) SMEM f32:
    [3i+0] m_i   - accumulator multiplier sW_i * sX_i
    [3i+1] inv_i - 1 / sX_{i+1}, the next layer's activation quant step
    [3i+2] mf_i  - skip-dot multiplier sW_i * sX_0 (feats scale)

    The skip layer runs as TWO dots (trunk columns, feats columns) so
    each operand keeps its own scale; total contraction width is the
    same as the fused dot, so MXU cost is identical.
    """
    ws = refs[:num_layers]
    bs = refs[num_layers:2 * num_layers]
    out_ref = refs[2 * num_layers]
    int_mode = qdtype == jnp.int8
    acc_t = jnp.int32 if int_mode else jnp.float32
    dn = (((1,), (0,)), ((), ()))
    feats = feats_ref[:]  # (FEAT_PAD, B) already quantised
    x = feats
    for i in range(num_layers):
        w = ws[i][:]
        if i == SKIP:
            trunk_cols = w.shape[1] - feats.shape[0]
            acc = jax.lax.dot_general(w[:, :trunk_cols], _zpad(x, trunk_cols),
                                      dn, preferred_element_type=acc_t)
            accf = jax.lax.dot_general(w[:, trunk_cols:], feats, dn,
                                       preferred_element_type=acc_t)
            y = (acc.astype(jnp.float32) * scal_ref[0, 3 * i]
                 + accf.astype(jnp.float32) * scal_ref[0, 3 * i + 2]
                 + bs[i][:])
        else:
            acc = jax.lax.dot_general(w, _zpad(x, w.shape[1]), dn,
                                      preferred_element_type=acc_t)
            y = acc.astype(jnp.float32) * scal_ref[0, 3 * i] + bs[i][:]
        if i < num_layers - 1:
            y = jnp.maximum(y, 0.0)
            if requant:
                if int_mode:
                    q = jnp.clip(jnp.round(y * scal_ref[0, 3 * i + 1]),
                                 -127.0, 127.0)
                    x = q.astype(jnp.int8)
                else:
                    x = (y * scal_ref[0, 3 * i + 1]).astype(qdtype)
            else:
                x = y.astype(qdtype)
        else:
            x = y
    out_ref[:] = x


# ------------------------------------------------------------- harnesses

def build_call(variant, ws_np, bs_np, feats_np, inputs_np, n):
    """Returns (jit_fn, device_feats) running the chain over n rays."""
    num_layers = len(ws_np)
    grid = (n // BLOCK,)
    out_w = ws_np[-1].shape[0]

    full = lambda a: pl.BlockSpec(
        a.shape, lambda i: tuple([0] * a.ndim), memory_space=pltpu.VMEM)
    blk = lambda rows: pl.BlockSpec(
        (rows, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)

    # Per-layer input-activation absmax from the host calibration run:
    xmax = [max(1e-6, float(np.abs(a).max())) for a in inputs_np]
    fmax = max(1e-6, float(np.abs(feats_np).max()))

    if variant == "bf16":
        kern = functools.partial(_bf16_kernel, num_layers)
        weights = [jnp.asarray(w, jnp.bfloat16) for w in ws_np]
        biases = [jnp.asarray(b, jnp.float32) for b in bs_np]
        in_specs = [blk(feats_np.shape[0])]
        extra = []
        tail = []
        feats_dev = jnp.asarray(feats_np, jnp.float32)
    elif variant == "int8_perchan":
        kern = functools.partial(_int8_perchan_kernel, num_layers)
        sw = [np.maximum(np.abs(w).max(axis=1, keepdims=True), 1e-6) / 127.0
              for w in ws_np]  # (out, 1) per-channel
        sx = [m / 127.0 for m in xmax]
        sf = fmax / 127.0
        weights = [jnp.asarray(np.clip(np.round(w / s), -127, 127), jnp.int8)
                   for w, s in zip(ws_np, sw)]
        biases = [jnp.asarray(b, jnp.float32) for b in bs_np]
        mults = [jnp.asarray(sw[i] * sx[i], jnp.float32)
                 for i in range(num_layers)]
        mult_f = jnp.asarray(sw[SKIP] * sf, jnp.float32)
        scal = np.zeros((1, 3 * num_layers), np.float32)
        for i in range(num_layers):
            scal[0, 3 * i + 1] = (1.0 / sx[i + 1]) if i + 1 < len(sx) else 1.0
        in_specs = [blk(-(-FEAT // 32) * 32),
                    pl.BlockSpec(scal.shape, lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)]
        extra = [jnp.asarray(scal)]
        tail = mults + [mult_f]
        fq = np.clip(np.round(feats_np / sf), -127, 127)
        fq = np.pad(fq, ((0, -(-FEAT // 32) * 32 - FEAT), (0, 0)))
        feats_dev = jnp.asarray(fq, jnp.int8)
    else:
        int_mode = variant.startswith("int8")
        requant = variant in ("int8_requant", "fp8_e4m3")
        qdtype = jnp.int8 if int_mode else jnp.float8_e4m3fn
        qmax = 127.0 if int_mode else 224.0  # e4m3 max 448, keep headroom
        kern = functools.partial(_narrow_kernel, num_layers, requant, qdtype)
        sw = [max(1e-6, float(np.abs(w).max())) / qmax for w in ws_np]
        sx = [m / qmax for m in xmax]
        sf = fmax / qmax
        if int_mode:
            qw = [np.clip(np.round(w / s), -127, 127) for w, s in zip(ws_np, sw)]
        else:
            qw = [w / s for w, s in zip(ws_np, sw)]
        weights = [jnp.asarray(w, qdtype) for w in qw]
        biases = [jnp.asarray(b, jnp.float32) for b in bs_np]
        scal = np.zeros((1, 3 * num_layers), np.float32)
        for i in range(num_layers):
            scal[0, 3 * i] = sw[i] * sx[i]
            scal[0, 3 * i + 1] = (1.0 / sx[i + 1]) if i + 1 < len(sx) else 1.0
            scal[0, 3 * i + 2] = sw[i] * sf
        in_specs = [blk(-(-FEAT // 32) * 32),
                    pl.BlockSpec(scal.shape, lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)]
        extra = [jnp.asarray(scal)]
        fq = feats_np / sf
        if int_mode:
            fq = np.clip(np.round(fq), -127, 127)
        fq = np.pad(fq, ((0, -(-FEAT // 32) * 32 - FEAT), (0, 0)))
        feats_dev = jnp.asarray(fq, qdtype)
        tail = []

    in_specs += ([full(w) for w in weights] + [full(b) for b in biases]
                 + [full(m) for m in tail])

    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((out_w, n), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=blk(out_w),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )

    @jax.jit
    def run(feats):
        return call(feats, *extra, *weights, *biases, *tail)

    return run, feats_dev


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="bf16,int8_requant,int8_perchan,"
                    "int8_raw,fp8_e4m3,fp8_raw")
    ap.add_argument("--iters", type=int, default=0,
                    help="timed iterations (0 = auto for >=5 s window)")
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    _ = float(jnp.sum(jnp.arange(8.0)))  # tunnel warmup

    n = -(-WIDTH * HEIGHT // BLOCK) * BLOCK
    rng = np.random.default_rng(7)
    u = rng.random(n).astype(np.float32)
    v = rng.random(n).astype(np.float32)
    feats = encode_np(u, v)

    results = {"device": str(dev), "rays": n, "block": BLOCK,
               "arch": "6x320 E=12 (+head)", "variants": {}}
    path = os.path.join(os.path.dirname(__file__), "..", "docs", "QUANT.json")

    def flush():
        with open(path, "w") as f:
            json.dump(results, f, indent=2)

    base_ms = None
    for variant in args.variants.split(","):
        variant = variant.strip()
        pad_to = None if variant == "bf16" else 32
        ws, bs = make_weights(np.random.default_rng(3), pad_to)
        ref, inputs = f32_chain_np(ws, bs, feats)
        try:
            run, feats_dev = build_call(variant, ws, bs, feats, inputs, n)
            t0 = time.monotonic()
            out = run(feats_dev)
            float(jnp.sum(out.ravel()[:8]))
            compile_s = time.monotonic() - t0

            t0 = time.monotonic()
            out = run(feats_dev)
            float(jnp.sum(out.ravel()[:8]))
            step_s = time.monotonic() - t0
            iters = args.iters or max(5, int(5.0 / max(step_s, 1e-3)))
            t0 = time.monotonic()
            for _ in range(iters):
                out = run(feats_dev)
            float(jnp.sum(out.ravel()[:8]))
            ms = (time.monotonic() - t0) / iters * 1e3

            out_h = np.asarray(out)[: ref.shape[0]]
            denom = np.abs(ref).max()
            rel = float(np.abs(out_h - ref).max() / denom)
            entry = {"ms_per_sample": round(ms, 3),
                     "compile_s": round(compile_s, 1),
                     "rel_err_vs_f32": float(f"{rel:.3e}")}
            if variant == "bf16":
                base_ms = ms
            if base_ms:
                entry["speedup_vs_bf16"] = round(base_ms / ms, 3)
            results["variants"][variant] = entry
            flush()
            print(f"{variant}: {ms:.3f} ms/sample  rel_err={rel:.2e}"
                  + (f"  ({base_ms / ms:.2f}x bf16)" if base_ms else ""),
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001 - record Mosaic rejections
            msg = str(e).split("\n")[0][:300]
            results["variants"][variant] = {"error": msg}
            flush()
            print(f"{variant}: FAILED: {msg}", file=sys.stderr)

    print(json.dumps(results["variants"]))


if __name__ == "__main__":
    main()
