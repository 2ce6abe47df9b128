"""Fused NIF MLP inference as a Pallas TPU kernel.

The whole network lives in VMEM for the duration of a ray block - the
TPU analog of the reference evaluating the NIF entirely out of on-chip
SRAM (reference: README.md:7-12, src/neural_networks/NifModel.cpp).
The XLA path (models/nif.nif_apply) round-trips every (P, hidden)
activation through HBM between layers; here each grid step encodes a
block of UVs, runs the full matmul chain on the MXU from VMEM, decodes,
and writes only the final radiance - HBM traffic drops from
O(P * hidden * layers) to O(P * channels).

Two TPU-specific design choices (both measured, each ~2x on v5e):

* **Transposed (feature-major) data flow.**  Activations are laid out
  ``(features, B)`` so the batch rides the 128-wide VPU lane dimension.
  In the natural ``(B, features)`` layout every elementwise op on the
  Fourier features uses only ``embedding_dim`` (=12) of 128 lanes.
  Weights are therefore fed pre-transposed ``(out, in)``.

* **Re-seeded double-angle recurrence for the Fourier encoder.**  The
  reference encodes ``[sin(u 2^j), sin(v 2^j), cos(u 2^j), cos(v 2^j)]``
  for j < embedding_dim (NifModel.cpp:185-218).  Evaluating those 4E
  full-range transcendentals per sample dominated the fused kernel
  (~45% of runtime), so octaves are produced by the recurrence
  ``sin 2x = 2 sin x cos x``, ``cos 2x = 1 - 2 sin^2 x`` - but the
  recurrence alone drifts ~2^j ulps (the doubling map is chaotic), and
  on reference-class high-frequency content that COHERENT top-octave
  phase error measured a 6.8 dB reconstruction loss vs the direct
  encode the net was trained with (docs/QUANT.json "encode_ab"; the
  incoherent bf16 feature rounding of 4x the magnitude costs < 0.5 dB).
  So every _SEED_STRIDE-th octave is re-seeded exactly: the angle
  ``theta_j = 2^j * 2(u-1)`` is EXACT in f32 (power-of-two scaling),
  a 3-term Cody-Waite reduction brings it into [-pi, pi] losslessly
  (the split constants sum to 2pi exactly in double), and sin/cos of
  the reduced residue seed the next group.  Error is bounded at
  ~2^(_SEED_STRIDE-1) ulp instead of 2^E, for 3x the trig of the pure
  recurrence - still far below the direct encode's 4E full-range calls.

Weights (~1 MB bf16 for the canonical 6x320 NIF) are broadcast to every
grid step and stay VMEM-resident (constant index map).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.nif import NifParams


def _pack_scal(params: NifParams, azimuth=None) -> jnp.ndarray:
    """(1, 8) SMEM decode scalars: max, mean, log flag, azimuth."""
    return jnp.stack(
        [
            params.max.astype(jnp.float32),
            params.mean[0].astype(jnp.float32),
            params.mean[1].astype(jnp.float32),
            params.mean[2].astype(jnp.float32),
            jnp.where(params.log_tone_map, 1.0, 0.0),
            (jnp.zeros((), jnp.float32) if azimuth is None
             else jnp.asarray(azimuth, jnp.float32)),
            jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32),
        ]
    ).reshape(1, 8)


# 3-term Cody-Waite split of 2*pi: _P1 + _P2 + _P3 == 2*pi exactly in
# double, _P1/_P2 carry few mantissa bits so k*_P1 / k*_P2 are exact in
# f32 for the k <= ~2^11 this encode produces (E <= 16).
_P1 = 6.28125
_P2 = 0.0019352436065673828
_P3 = 6.357301884918343e-08
_INV_2PI = 0.15915494309189535
_SEED_STRIDE = 4  # re-seed the double-angle recurrence every 4 octaves


def _sincos_reduced(x, j: int):
    """Exact-seeded sin/cos of 2^j * x: the f32 angle is exact (power-of
    -two scale of an exact operand), Cody-Waite reduces it into
    [-pi, pi] with no precision loss, and the transcendentals run on
    the reduced residue (Mosaic-safe small-argument range)."""
    theta = x * float(2 ** j)
    k = jnp.round(theta * _INV_2PI)
    r = ((theta - k * _P1) - k * _P2) - k * _P3
    return jnp.sin(r), jnp.cos(r)


def nif_encode(u, v, embedding_dim: int, compute_dtype):
    """Fourier features (NifModel.cpp:185-218) -> (4E, B).

    uv' = 2(uv - 1), rows [sin(u 2^j) | sin(v 2^j) | cos(u 2^j) |
    cos(v 2^j)] built by the re-seeded double-angle recurrence (module
    docstring): octave j = 0, 4, 8, ... evaluated exactly via
    _sincos_reduced, octaves in between by two FMAs each.
    """
    uu = 2.0 * (u - 1.0)  # (B,) - exact: u in [0,1], Sterbenz + *2
    vv = 2.0 * (v - 1.0)

    def octaves(x):
        ss, cc = [], []
        for j in range(embedding_dim):
            if j % _SEED_STRIDE == 0:
                s, c = _sincos_reduced(x, j)
            else:
                s, c = ss[-1], cc[-1]
                s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
            ss.append(s)
            cc.append(c)
        return ss, cc

    sus, cus = octaves(uu)
    svs, cvs = octaves(vv)
    return jnp.stack(sus + svs + cus + cvs, axis=0).astype(compute_dtype)


def nif_layer(x, feats, w_ref, b_ref, is_last: bool, upcast_dot: bool = False):
    """One Dense stage of the chain (skip-concat when widths mismatch).

    ``upcast_dot`` casts bf16 operands to f32 before the dot - needed in
    interpret mode, where XLA CPU's thunk runtime cannot execute
    BF16 x BF16 = F32 dots in some kernel contexts.  Numerically
    equivalent: bf16 products are exact in f32 and the MXU accumulates
    at f32 either way; the TPU path never sets it (bf16 matmuls are 2x).
    """
    w = w_ref[:]
    if x.shape[0] != w.shape[1]:  # skip-concat (NifModel.cpp:303-309)
        x = jnp.concatenate([x, feats], axis=0)
    if upcast_dot:
        x = jnp.dot(w.astype(jnp.float32), x.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    else:
        x = jnp.dot(w, x, preferred_element_type=jnp.float32)
    x = x + b_ref[:].astype(jnp.float32)
    if not is_last:
        x = jnp.maximum(x, 0.0).astype(w.dtype)
    return x


def nif_decode(x, scal_ref):
    """Decode at f32 (NifModel.cpp:221-245): y = x*max + mean; exp if log."""
    max_v = scal_ref[0, 0]
    mean = jnp.stack([scal_ref[0, 1], scal_ref[0, 2], scal_ref[0, 3]])
    log_flag = scal_ref[0, 4]
    y = x.astype(jnp.float32) * max_v + mean[:, None]
    return jnp.where(log_flag > 0.5, jnp.exp(y), y)


def equirect_from_dir(dx, dy, dz, azimuth):
    """Equirect (u, v) from escaped-ray directions; non-escaped lanes
    (zero dirs) produce (0, 0) exactly like PreProcessEscapedRays
    (codelets.cpp:333-352).  Returns (u, v)."""
    from .mathx import acos as _acos, atan2 as _atan2

    escaped = (dx * dx + dy * dy + dz * dz) > 0.5  # unit dirs; 0 = not escaped
    theta = _acos(jnp.clip(dy, -1.0, 1.0))
    phi = _atan2(dz, dx) + azimuth
    two_pi = jnp.float32(2.0 * np.pi)
    phi = jnp.where(phi < 0.0, phi + two_pi, jnp.where(phi > two_pi, phi - two_pi, phi))
    u = jnp.where(escaped, theta * jnp.float32(1.0 / np.pi), 0.0)
    v = jnp.where(escaped, phi * (1.0 / two_pi), 0.0)
    return u, v


def _mlp_core(num_layers: int, embedding_dim: int, u, v, scal_ref,
              w_refs, b_refs, upcast_dot: bool = False):
    """Encode -> matmul chain -> decode on (B,) uv vectors; returns (3, B).

    Shared by the plain inference kernel and the fused env-shading
    kernel below.  ``upcast_dot`` must be set in interpret mode (see
    nif_layer; the megastep kernel guards the same way).
    """
    feats = nif_encode(u, v, embedding_dim, w_refs[0].dtype)
    x = feats  # (feat_dim, B)
    for i in range(num_layers):
        x = nif_layer(x, feats, w_refs[i], b_refs[i], i == num_layers - 1,
                      upcast_dot=upcast_dot)
    return nif_decode(x, scal_ref)


# ------------------------------------------------------------------------
# int8 chain (models/quant.py): the MXU's double-rate mode
# ------------------------------------------------------------------------

def _rup(x: int, m: int) -> int:
    return -(-x // m) * m


def _zpad_rows(x, rows: int):
    """Zero-pad the leading (feature) axis - exact for the integer dots
    (padded weight columns are zero too)."""
    if x.shape[0] >= rows:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((rows - x.shape[0], x.shape[1]), x.dtype)], axis=0)


def pack_quant_operands(qparams):
    """Trace-time device operands for the int8 kernels.

    Pads every contraction dim to the MXU's int8 sublane tile (32) and
    the head's output to the i32 result tile (8) - zero padding, so the
    integer accumulators are unchanged and the padded chain is bitwise
    the unpadded XLA twin (models/quant.nif_apply_quant) on the same
    quantised features (tests/test_quant.py).
    Returns (kernels_t, biases_c, mults_c, mult_skip_c, skip_layer).
    Weights come out feature-major (out, in_pad) with the skip layer's
    trunk and feature column groups padded SEPARATELY (the kernel runs
    them as two dots, models/quant.py docstring).
    """
    nl = len(qparams.kernels)
    skip = qparams.skip_layer
    feat_rows = 4 * qparams.embedding_dim
    feat_pad = _rup(feat_rows, 32)
    ws, bs, ms = [], [], []
    for i, w in enumerate(qparams.kernels):  # w: int8 (in, out)
        wt = w.T  # (out, in)
        out_w, in_w = wt.shape
        if i == skip:
            trunk = in_w - feat_rows
            wt = jnp.concatenate(
                [
                    jnp.pad(wt[:, :trunk], ((0, 0), (0, _rup(trunk, 32) - trunk))),
                    jnp.pad(wt[:, trunk:], ((0, 0), (0, feat_pad - feat_rows))),
                ],
                axis=1,
            )
        else:
            wt = jnp.pad(wt, ((0, 0), (0, _rup(in_w, 32) - in_w)))
        b = qparams.biases[i].reshape(-1, 1)
        m = qparams.mults[i].reshape(-1, 1)
        if i == nl - 1 and out_w % 8:
            pad = _rup(out_w, 8) - out_w
            wt = jnp.pad(wt, ((0, pad), (0, 0)))
            b = jnp.pad(b, ((0, pad), (0, 0)))
            m = jnp.pad(m, ((0, pad), (0, 0)))
        ws.append(wt)
        bs.append(b)
        ms.append(m)
    mskip = qparams.mult_skip.reshape(-1, 1)
    return ws, bs, ms, mskip, skip


def _pack_scal_q(qparams, azimuth=None) -> jnp.ndarray:
    """(1, 8 + L) SMEM row: the bf16 decode scalars followed by the
    per-layer requant steps inv_next[i] = 255/a_i (models/quant.py)."""
    head = _pack_scal(qparams, azimuth)  # reads max/mean/log flag fields
    return jnp.concatenate(
        [head, qparams.inv_next.astype(jnp.float32).reshape(1, -1)], axis=1)


def _quant_mlp_core(num_layers: int, embedding_dim: int, skip_layer: int,
                    u, v, scal_ref, w_refs, b_refs, m_refs, mskip_ref):
    """int8 encode -> chain -> f32 decode, feature-major; returns (3, B).

    The arithmetic is models/quant.quant_layer_t verbatim, on operands
    padded by pack_quant_operands - integer dots over zero padding are
    exact, so given the same int8 features the result is BITWISE the
    XLA twin's (tests/test_quant.py pins the packed chain).  End to end
    the paths differ only through the compile-context-sensitive f32
    encode (models/quant.py docstring), so the kernel-vs-twin test is
    tolerance-based like the bf16 one.  Decode stays f32 like the bf16
    path (NifModel.cpp:221-245).
    """
    from ..models.quant import QMAX, quant_layer_t

    feats_f = nif_encode(u, v, embedding_dim, jnp.float32)
    feats = jnp.clip(jnp.round(feats_f * QMAX), -QMAX, QMAX).astype(jnp.int8)
    feats = _zpad_rows(feats, w_refs[0].shape[1])
    x = feats
    for i in range(num_layers):
        w = w_refs[i][:]
        rows = (w.shape[1] - feats.shape[0]) if i == skip_layer else w.shape[1]
        x = quant_layer_t(
            _zpad_rows(x, rows), feats, w, b_refs[i][:], m_refs[i][:],
            mskip_ref[:], scal_ref[0, 8 + i],
            is_last=i == num_layers - 1, is_skip=i == skip_layer,
        )
    return nif_decode(x[:3], scal_ref)


def _kernel(num_layers: int, embedding_dim: int, upcast_dot: bool,
            skip_layer: int, u_ref, v_ref, scal_ref, *refs):
    w_refs = refs[:num_layers]          # (out, in) each
    b_refs = refs[num_layers : 2 * num_layers]  # (out, 1) each
    if len(refs) > 2 * num_layers + 1:  # quant: + mults, mult_skip
        m_refs = refs[2 * num_layers : 3 * num_layers]
        mskip_ref = refs[3 * num_layers]
        out_ref = refs[3 * num_layers + 1]
        out_ref[:] = _quant_mlp_core(
            num_layers, embedding_dim, skip_layer, u_ref[:], v_ref[:],
            scal_ref, w_refs, b_refs, m_refs, mskip_ref,
        )
        return
    out_ref = refs[2 * num_layers]      # (3, B)
    out_ref[:] = _mlp_core(
        num_layers, embedding_dim, u_ref[:], v_ref[:], scal_ref, w_refs,
        b_refs, upcast_dot,
    )


def _env_shade_kernel(num_layers: int, embedding_dim: int, upcast_dot: bool,
                      skip_layer: int, escd_ref, escw_ref, scal_ref, *refs):
    """Equirect UV from escaped-ray directions -> NIF -> apply weights.

    Fuses PreProcessEscapedRays + the NIF + PostProcessEscapedRays
    (codelets.cpp:312-385) into one kernel: theta = acos(y),
    phi = atan2(z, x) + azimuth wrapped to [0, 2pi] (codelets.cpp:333-344,
    via ops/mathx polynomials - Mosaic has no acos/atan2), u = theta/pi,
    v = phi/2pi; non-escaped lanes are zeroed exactly like the reference
    to avoid FP garbage (codelets.cpp:348-352).  Output is the radiance
    contribution esc_w * env_rgb with the bgr->rgb flip applied
    (codelets.cpp:377-378), so row 0 is already R.

    With quant operands (the extra mults/mult_skip refs) the chain runs
    the int8 path (_quant_mlp_core) instead of the bf16 one.
    """
    w_refs = refs[:num_layers]
    b_refs = refs[num_layers : 2 * num_layers]

    u, v = equirect_from_dir(
        escd_ref[0, :], escd_ref[1, :], escd_ref[2, :], scal_ref[0, 5]
    )
    if len(refs) > 2 * num_layers + 1:  # quant: + mults, mult_skip
        m_refs = refs[2 * num_layers : 3 * num_layers]
        mskip_ref = refs[3 * num_layers]
        out_ref = refs[3 * num_layers + 1]
        out = _quant_mlp_core(num_layers, embedding_dim, skip_layer, u, v,
                              scal_ref, w_refs, b_refs, m_refs, mskip_ref)
    else:
        out_ref = refs[2 * num_layers]  # (3, B) radiance contribution, RGB
        out = _mlp_core(num_layers, embedding_dim, u, v, scal_ref, w_refs,
                        b_refs, upcast_dot)
    # bgr -> rgb + throughput weights (esc_w rows are zero unless escaped):
    out_ref[:] = jnp.stack(
        [escw_ref[0, :] * out[2], escw_ref[1, :] * out[1], escw_ref[2, :] * out[0]],
        axis=0,
    )


@functools.partial(
    jax.jit, static_argnames=("block_size", "interpret")
)
def nif_apply_pallas_t(
    params: NifParams,
    u: jnp.ndarray,
    v: jnp.ndarray,
    block_size: int = 4096,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused NIF inference -> (3, P) float32 in network channel order.

    Channel-major output so the hot path (escaped-ray shading) consumes
    rows directly with zero transposes.
    """
    from ..models.quant import QuantNifParams

    p = u.shape[0]
    num_layers = len(params.kernels)
    quant = isinstance(params, QuantNifParams)
    pad = (-p) % block_size
    if pad:
        u = jnp.pad(u, (0, pad))
        v = jnp.pad(v, (0, pad))
    n = p + pad
    grid = (n // block_size,)

    # Feature-major weight/bias layout (transposed once at trace time;
    # ~1 MB, fused away by XLA after the first call).
    if quant:
        kernels_t, biases_c, mults_c, mskip_c, skip_layer = (
            pack_quant_operands(params))
        scal = _pack_scal_q(params)
        tail = mults_c + [mskip_c]
    else:
        kernels_t = [w.T for w in params.kernels]
        biases_c = [b.reshape(-1, 1) for b in params.biases]
        scal = _pack_scal(params)
        tail = []
        skip_layer = -1

    uv_spec = pl.BlockSpec((block_size,), lambda i: (i,), memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(
        a.shape, lambda i: tuple([0] * a.ndim), memory_space=pltpu.VMEM
    )

    out = pl.pallas_call(
        functools.partial(_kernel, num_layers, params.embedding_dim,
                          interpret, skip_layer),
        out_shape=jax.ShapeDtypeStruct((3, n), jnp.float32),
        grid=grid,
        in_specs=[
            uv_spec,
            uv_spec,
            pl.BlockSpec(scal.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            *[full(w) for w in kernels_t],
            *[full(b) for b in biases_c],
            *[full(m) for m in tail],
        ],
        out_specs=pl.BlockSpec(
            (3, block_size), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        # Independent grid blocks - megacore TPUs may parallelise them:
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(u, v, scal, *kernels_t, *biases_c, *tail)
    return out[:, :p]


def nif_apply_pallas(
    params: NifParams,
    u: jnp.ndarray,
    v: jnp.ndarray,
    block_size: int = 4096,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for models.nif.nif_apply -> (P, 3) float32."""
    return nif_apply_pallas_t(params, u, v, block_size, interpret).T


@functools.partial(
    jax.jit, static_argnames=("block_size", "interpret")
)
def nif_env_shade_pallas(
    params: NifParams,
    esc_dir,  # Vec3 of (P,) escaped-ray directions (zero where not escaped)
    esc_w,  # Vec3 of (P,) escape throughput weights (zero where not escaped)
    azimuth,  # () env-map rotation, radians
    block_size: int = 4096,
    interpret: bool = False,
):
    """Fused equirect + NIF + env-apply -> Vec3 radiance contribution.

    One kernel replaces the XLA chain equirect_uv -> mask -> nif -> bgr
    flip -> esc_w multiply in the hot path (see _env_shade_kernel).
    """
    from ..core.vecmath import Vec3
    from ..models.quant import QuantNifParams

    p = esc_dir.x.shape[0]
    num_layers = len(params.kernels)
    pad = (-p) % block_size
    escd = jnp.stack([esc_dir.x, esc_dir.y, esc_dir.z], axis=0)
    escw = jnp.stack([esc_w.x, esc_w.y, esc_w.z], axis=0)
    if pad:
        escd = jnp.pad(escd, ((0, 0), (0, pad)))
        escw = jnp.pad(escw, ((0, 0), (0, pad)))
    n = p + pad
    grid = (n // block_size,)

    if isinstance(params, QuantNifParams):
        kernels_t, biases_c, mults_c, mskip_c, skip_layer = (
            pack_quant_operands(params))
        scal = _pack_scal_q(params, azimuth)
        tail = mults_c + [mskip_c]
    else:
        kernels_t = [w.T for w in params.kernels]
        biases_c = [b.reshape(-1, 1) for b in params.biases]
        scal = _pack_scal(params, azimuth)
        tail = []
        skip_layer = -1

    full = lambda a: pl.BlockSpec(
        a.shape, lambda i: tuple([0] * a.ndim), memory_space=pltpu.VMEM
    )
    rows3 = pl.BlockSpec((3, block_size), lambda i: (0, i), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_env_shade_kernel, num_layers,
                          params.embedding_dim, interpret, skip_layer),
        out_shape=jax.ShapeDtypeStruct((3, n), jnp.float32),
        grid=grid,
        in_specs=[
            rows3,
            rows3,
            pl.BlockSpec(scal.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            *[full(w) for w in kernels_t],
            *[full(b) for b in biases_c],
            *[full(m) for m in tail],
        ],
        out_specs=rows3,
        # Independent grid blocks - megacore TPUs may parallelise them:
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(escd, escw, scal, *kernels_t, *biases_c, *tail)
    return Vec3(out[0, :p], out[1, :p], out[2, :p])
