"""The fully fused render step: sample loop + trace + NIF in ONE kernel.

This is the TPU answer to the reference keeping its entire progressive
step on-device - the sample loop (popops::countedForLoop,
reference: src/PathTracerApp.cpp:466-468) around the RayTraceKernel and
the NIF exec - with one addition the reference cannot make: the trace
and the neural env light run in the SAME kernel, so rays, escape
records and activations never leave VMEM.

Why this shape (all numbers measured on v5e at 1104x1000):

* The NIF matmul chain is the cost: ~1.67 padded MFLOP/ray (the 320/368
  widths pad to 384-multiples of the 128-wide MXU) = 9.4 ms/sample at
  peak - and the standalone fused NIF kernel measures 9.5 ms, i.e. it
  already runs AT its roofline.  The trace megakernel is pure VPU work
  at 3.9 ms/sample.  Run separately that is ~13.4 ms/sample of serial
  device time, plus an HBM round-trip for the escape records.
* Iteration s of the in-kernel sample loop runs the FULL NIF chain for
  sample s-1's escaped rays, then traces sample s (chain-then-trace;
  the env contribution lands one iteration late, plus an epilogue for
  the last sample - accumulation is a sum, so nothing changes).  An
  earlier design hand-interleaved the layer matmuls between bounce
  computations chasing MXU/VPU overlap; measurement rejected it
  (scripts/megastep_split.py, docs/PERF.md "Things measured and
  rejected"): zero overlap materialised - register pressure and the
  relu dependency chain pace the MXU anyway - and the interleave
  blocked the dead-block early-out, which IS a measured win.

Per-step HBM traffic drops from O(samples * 9P f32) for the two-kernel
pipeline to O(P) - rays, escape records and activations never leave
VMEM, like the reference's SRAM-resident design (README.md:7-12).

Bounce semantics are render/wavefront.bounce_body via
trace_pallas.bounce_once; NIF semantics are models/nif.nif_apply via
nif_pallas.nif_layer/nif_decode.  Host-noise mode gives the exact-replay
parity oracle (tests/test_megastep.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.scene import Scene
from ..render import qmc
from ..core.vecmath import Vec3
from ..models.nif import NifParams
from .nif_pallas import _pack_scal, equirect_from_dir, nif_decode, nif_encode, nif_layer
from .trace_pallas import (
    bounce_cond,
    bounce_once,
    draw_aa_jitter,
    initial_bounce_state,
    make_uniform_fn,
    pack_scene,
    raygen,
    sobol_unit_kernel,
    sobol_word_kernel,
)


class MegaStepOut(NamedTuple):
    radiance: Vec3  # per-pixel radiance sum over the step's samples
    path_len: jnp.ndarray  # int32 path-length sum
    # Sum over samples of luminance(sample radiance)^2, for the adaptive
    # sampler's variance estimate (render/adaptive.py).  None unless the
    # kernel ran with with_stats=True.
    lum2: jnp.ndarray | None = None


# Rec.709 luma weights, used for the adaptive sampler's per-sample
# second-moment accumulator (render/adaptive.py shares these).
LUM_R, LUM_G, LUM_B = 0.2126, 0.7152, 0.0722

# The tuned hardware grid block (300-spp sweep: 2048 edges 1024/4096 by
# ~1%).  Exported so policy code (the app's auto --env-skip probe)
# reasons about the same block layout the kernel will run.
MEGASTEP_BLOCK = 2048


def _stub_nif_layer(x, feats, w_ref, b_ref, is_last: bool, upcast_dot=False):
    """Measurement stub (stub='nif'): same shapes/dtypes, ~no FLOPs.

    Used by the --device-timing in-kernel split (utils/devtime.py): the
    fused kernel minus its NIF matmuls isolates the trace component, the
    cycle-counter analog of the reference's split counters
    (src/PathTracerApp.cpp:438-462)."""
    out_dim = w_ref.shape[0]
    y = (x[:1] * 0.0 + 1.0).repeat(out_dim, axis=0)
    return y.astype(jnp.float32 if is_last else x.dtype)


def _stub_bounce(sph_ref, dsc_ref, num_s, num_d, st, rr, u1, u2, fr, b,
                 refr, stop, roul):
    """Measurement stub (stub='trace'): keeps the carry structure (and a
    data dependence on the bounce uniforms so nothing dead-codes) while
    doing ~no intersection/BSDF work."""
    return st._replace(path_len=st.path_len + (rr < 2.0).astype(jnp.int32))


def _env_contrib(ex, ey, ez, wx, wy, wz, scal_ref, w_refs, b_refs,
                 embedding_dim: int, upcast_dot: bool = False,
                 layer_fn=nif_layer, env_skip: bool = False,
                 quant_refs=None):
    """Escaped-ray env shade: equirect -> NIF chain -> weighted rgb.

    Dead-block env-skip (env_skip=True): when EVERY lane's escape
    weight is zero (the whole block's paths were absorbed or
    roulette-killed without escaping) the weighted contribution is
    exactly zero, so the entire matmul chain is skipped behind one
    scalar conditional - the MXU analog of the trace's dead-block
    early-out.  Escape weights are path throughputs (products of
    albedos, >= 0), so a zero sum means every weight component is zero
    and the skip branch is an exact identity (zero weights times the
    finite NIF output is exactly the returned zeros; bit-exact on an
    enclosed scene, tests/test_megastep.py::test_megastep_env_skip_exact).
    When the guard does NOT fire, wrapping the chain in lax.cond can
    still change XLA fusion and so reassociate the dots by <= 1 ULP
    (~2e-7 observed) - semantically identical, not bit-identical,
    which is the other half of that test.  The reference pays the full
    batch regardless (codelets.cpp:348-352).  Measured on v5e
    (scripts/envskip_bench.py, docs/ENVSKIP.json): 7.55x on a fully
    enclosed scene (1.16 vs 8.77 ms/sample - the NIF chain elided),
    but the guard costs ~1.5% on open scenes where no block is ever
    all-dead (default/mirror_hall/glass_caustic: dead-block fraction
    <= 0.0005) - hence OFF by default, opt in per scene via
    StaticConfig.env_skip / --env-skip."""
    num_layers = len(w_refs)

    def full_chain(ops):
        ex_, ey_, ez_, wx_, wy_, wz_ = ops
        u, v = equirect_from_dir(ex_, ey_, ez_, scal_ref[0, 5])
        if quant_refs is not None and layer_fn is nif_layer:
            # int8 chain (--nif-precision int8): ops/nif_pallas quant
            # core on operands packed by pack_quant_operands.
            from .nif_pallas import _quant_mlp_core

            m_refs, mskip_ref, skip_layer = quant_refs
            out = _quant_mlp_core(num_layers, embedding_dim, skip_layer,
                                  u, v, scal_ref, w_refs, b_refs, m_refs,
                                  mskip_ref)
        else:
            # Stubbed chains (devtime split) keep f32 feature shapes even
            # over int8 weight refs - timing scaffolding, not semantics.
            dtype = (jnp.float32 if quant_refs is not None
                     else w_refs[0].dtype)
            feats = nif_encode(u, v, embedding_dim, dtype)
            x = feats
            for i in range(num_layers):
                x = layer_fn(x, feats, w_refs[i], b_refs[i],
                             i == num_layers - 1, upcast_dot)
            out = nif_decode(x[:3], scal_ref)  # (3, B), network (bgr) order
        # bgr -> rgb flip + throughput weights (codelets.cpp:377-378):
        return wx_ * out[2], wy_ * out[1], wz_ * out[0]

    if not env_skip:
        return full_chain((ex, ey, ez, wx, wy, wz))

    def no_escapes(ops):
        z = ops[0] * 0.0
        return z, z, z

    total_w = jnp.sum(wx) + jnp.sum(wy) + jnp.sum(wz)
    return jax.lax.cond(total_w > 0.0, full_chain, no_escapes,
                        (ex, ey, ez, wx, wy, wz))


def _kernel(
    num_s: int,
    num_d: int,
    max_path_length: int,
    num_layers: int,
    embedding_dim: int,
    width: int,
    height: int,
    aa_noise_type: str,
    host_samples: int,  # 0 = hardware PRNG; >0 = host-noise parity mode
    sobol_dims: int,  # >0: leading dims from the in-kernel Owen-Sobol path
    upcast_dot: bool,  # interpret mode: f32 dots (nif_pallas.nif_layer)
    split_point: int | None,  # early-out split bounce; None = default formula
    stub: str | None,  # None | 'nif' | 'trace' | 'both' (devtime split)
    has_budgets: bool,  # per-block sample budgets (render/adaptive.py)
    with_stats: bool,  # accumulate per-record lum^2 second moments
    env_skip: bool,  # dead-block env-skip (_env_contrib)
    quant: bool,  # int8 NIF chain (QuantNifParams operands)
    skip_layer: int,  # quant only: skip-concat layer index (-1 = none)
    # refs:
    fpar_ref,  # SMEM (1, 8) f32
    ipar_ref,  # SMEM (1, 8) i32: roulette_depth seed0 seed1 n_samples sobol_key
    scal_ref,  # SMEM (1, 8[+L]) f32 NIF decode scalars (+ quant requant steps)
    sph_ref,
    dsc_ref,
    cols_ref,  # VMEM (B,)
    rows_ref,
    *refs,  # w*num_layers, b*num_layers, [mults, mult_skip], [budget],
    #         [pid/base], [noise], outputs
):
    w_refs = refs[:num_layers]
    b_refs = refs[num_layers : 2 * num_layers]
    rest = list(refs[2 * num_layers :])
    quant_refs = None
    if quant:
        m_refs = tuple(rest[:num_layers])
        del rest[:num_layers]
        quant_refs = (m_refs, rest.pop(0), skip_layer)
    bud_ref = rest.pop(0) if has_budgets else None
    pid_ref = base_ref = None
    if sobol_dims:
        pid_ref = rest.pop(0)
        base_ref = rest.pop(0)
    noise_ref = rest.pop(0) if host_samples else None
    if with_stats:
        acc_ref, plen_ref, l2_ref = rest
    else:
        (acc_ref, plen_ref), l2_ref = rest, None

    n = cols_ref.shape[0]
    tanfov_x = fpar_ref[0, 0]
    tanfov_y = fpar_ref[0, 1]
    aa_scale = fpar_ref[0, 2]
    refr_index = fpar_ref[0, 3]
    stop_prob = fpar_ref[0, 4]
    aperture = fpar_ref[0, 5]
    focal = fpar_ref[0, 6]
    roulette_depth = ipar_ref[0, 0]

    # Dims past the sobol prefix still come from the hardware PRNG:
    prng_tail = (4 + 4 * max_path_length - sobol_dims) if sobol_dims else 0
    if not host_samples and (not sobol_dims or prng_tail > 0):
        pltpu.prng_seed(ipar_ref[0, 1], ipar_ref[0, 2] + pl.program_id(0))
    uniforms = make_uniform_fn(n)
    layer_fn = _stub_nif_layer if stub in ("nif", "both") else nif_layer
    bounce_fn = _stub_bounce if stub in ("trace", "both") else bounce_once

    # Layer i of the PREVIOUS sample's NIF runs after bounce schedule[i]
    # of the CURRENT sample's trace - MXU and VPU work interleave so the
    # units overlap (module docstring).
    cols = cols_ref[:]
    rows = rows_ref[:]
    zero = jnp.zeros((n,), jnp.float32)
    # Per-block sample budget (adaptive sampling, render/adaptive.py).
    # Hardware-PRNG mode uses it as the sample-loop bound; host-noise
    # parity mode traces every noise row but GATES the contributions of
    # rows >= budget to zero, which consumes the identical noise layout
    # while computing the identical estimator.  The whole (G, 1) budget
    # table rides SMEM (Mosaic requires sub-array blocks to tile 8x128,
    # so a (1,1) per-block spec is rejected); each block reads its row:
    bud = bud_ref[pl.program_id(0), 0] if has_budgets else None
    bud_f = bud.astype(jnp.float32) if has_budgets else None

    def one_sample(sample_idx, carry):
        if with_stats:
            (ar, ag, ab, apl, ex, ey, ez, wx, wy, wz, pr, pg, pb, l2v) = carry
        else:
            (ar, ag, ab, apl, ex, ey, ez, wx, wy, wz) = carry

        def noise_row(j):
            return noise_ref[sample_idx, j, :]

        h = key_u = h_masks = None
        if host_samples:
            a1, a2 = noise_row(0), noise_row(1)
            l1, l2 = noise_row(2), noise_row(3)
        elif sobol_dims:
            # Owen-Sobol prefix dims: per-lane index = worklist
            # sampleCount + the in-step sample counter, so the sequence
            # continues across steps and adaptive budgets.  No stream
            # position - bounce dims are computed lazily inside the
            # unroll, so the dead-block early-out skips their cost too.
            key_u = ipar_ref[0, 4].astype(jnp.uint32)
            idx = base_ref[:] + sample_idx
            h = sobol_word_kernel(pid_ref[:], idx, key_u)
            h_masks = qmc.sobol_masks(h)
            cam = [sobol_unit_kernel(h, key_u, d, h_masks) for d in range(4)]
            rnd_tail = uniforms(prng_tail) if prng_tail else []
            a1, a2 = draw_aa_jitter(lambda k: cam[:k], aa_noise_type)
            l1, l2 = cam[2], cam[3]
        else:
            # ONE stateful PRNG call for the whole sample: prng ops fence
            # instruction scheduling, and per-bounce draws would stop the
            # NIF matmuls from overlapping the bounce VPU work.
            rnd_all = uniforms(4 + 4 * max_path_length)
            a1, a2 = draw_aa_jitter(
                lambda k: rnd_all[:k], aa_noise_type
            )
            l1, l2 = rnd_all[2], rnd_all[3]
        o, d = raygen(
            cols, rows, a1, a2, l1, l2,
            width=width, height=height, tanfov_x=tanfov_x, tanfov_y=tanfov_y,
            aa_scale=aa_scale, aperture=aperture, focal=focal,
        )
        st = initial_bounce_state(o, d)

        # Previous sample's env shade (the full chain; the epilogue
        # handles the last sample).  MXU work sits adjacent to the
        # trace's VPU work so the units may still overlap, but it is no
        # longer hand-interleaved: measurement showed zero overlap from
        # interleaving (scripts/megastep_split.py), and the interleave
        # blocked the dead-block early-out below.
        cr, cg, cb = _env_contrib(
            ex, ey, ez, wx, wy, wz, scal_ref, w_refs, b_refs, embedding_dim,
            upcast_dot, layer_fn, env_skip, quant_refs,
        )

        def bounce_rnd(b):
            if host_samples:
                return [noise_row(4 + 4 * b + j) for j in range(4)]
            if sobol_dims:
                return [
                    sobol_unit_kernel(h, key_u, dim, h_masks)
                    if dim < sobol_dims
                    else rnd_tail[dim - sobol_dims]
                    for dim in range(4 + 4 * b, 8 + 4 * b)
                ]
            return rnd_all[4 + 4 * b : 8 + 4 * b]

        def run_bounces(s, lo, hi):
            for b in range(lo, hi):
                s = bounce_fn(
                    sph_ref, dsc_ref, num_s, num_d, s, *bounce_rnd(b), b,
                    refr_index, stop_prob, roulette_depth,
                )
            return s

        def any_alive(s):
            return jnp.sum(s.alive.astype(jnp.float32)) > 0.0

        # Dead-block early-out: bounce_once is exactly the identity when
        # no lane is alive (every update is where(alive, ...)), and all
        # randomness is drawn up front, so skipping preserves replay
        # semantics.  With a raster-ordered worklist a block is a
        # contiguous image strip; sky strips lose every lane on bounce 0
        # (94% of paths escape, mean path length 1.6 at the default
        # scene).  Two nested conditionals (not one per bounce - that
        # explodes Mosaic compile time): skip after the primary bounce,
        # and again partway through the unroll.
        split = split_point if split_point is not None else min(
            1 + (max_path_length - 1) // 3, max_path_length
        )

        def tail_bounces(s):
            s = run_bounces(s, 1, split)
            if split < max_path_length:
                s = bounce_cond(
                    any_alive(s),
                    lambda t: run_bounces(t, split, max_path_length),
                    s,
                )
            return s

        st = run_bounces(st, 0, 1)
        if max_path_length > 1:
            st = bounce_cond(any_alive(st), tail_bounces, st)

        dr, dg, db = st.radiance.x, st.radiance.y, st.radiance.z
        dpl = st.path_len
        swx, swy, swz = st.esc_w.x, st.esc_w.y, st.esc_w.z
        if host_samples and has_budgets:
            # Gate sample rows past this block's budget: zero direct
            # radiance/path pushes now, and zero escape WEIGHTS so the
            # lagged env shade of this sample contributes nothing later
            # (and adds 0 to the lum^2 moment).
            mf = (jnp.float32(sample_idx) < bud_f).astype(jnp.float32)
            mi = mf.astype(jnp.int32)
            dr, dg, db = mf * dr, mf * dg, mf * db
            dpl = dpl * mi
            swx, swy, swz = mf * swx, mf * swy, mf * swz

        # bgr -> rgb flip + escape weights (codelets.cpp:377-378); the
        # weights are zero for sample -1 (carry init), so iteration 0
        # contributes nothing for the nonexistent previous sample:
        out = (
            ar + dr + cr,
            ag + dg + cg,
            ab + db + cb,
            apl + dpl,
            st.esc_dir.x, st.esc_dir.y, st.esc_dir.z,
            swx, swy, swz,
        )
        if with_stats:
            # The PREVIOUS sample is complete here (direct pr/pg/pb from
            # its own iteration + its env shade cr/cg/cb above): fold its
            # luminance^2 into the second-moment accumulator.  Gated
            # samples carried zeros, so they add 0.
            tr, tg, tb = pr + cr, pg + cg, pb + cb
            lum = LUM_R * tr + LUM_G * tg + LUM_B * tb
            out = out + (dr, dg, db, l2v + lum * lum)
        return out

    init = (zero, zero, zero, jnp.zeros((n,), jnp.int32),
            zero, zero, zero, zero, zero, zero)
    if with_stats:
        init = init + (zero, zero, zero, zero)
    if host_samples:
        carry = init
        for s in range(host_samples):
            carry = one_sample(s, carry)
    else:
        n_samples = bud if has_budgets else ipar_ref[0, 3]
        carry = jax.lax.fori_loop(0, n_samples, one_sample, init)

    if with_stats:
        ar, ag, ab, apl, ex, ey, ez, wx, wy, wz, pr, pg, pb, l2v = carry
    else:
        ar, ag, ab, apl, ex, ey, ez, wx, wy, wz = carry
    # Epilogue: the LAST sample's escaped rays still need their env light.
    cr, cg, cb = _env_contrib(
        ex, ey, ez, wx, wy, wz, scal_ref, w_refs, b_refs, embedding_dim,
        upcast_dot, layer_fn, env_skip, quant_refs,
    )
    acc_ref[:] = jnp.stack([ar + cr, ag + cg, ab + cb], axis=0)
    plen_ref[:] = apl.reshape(1, n)
    if with_stats:
        tr, tg, tb = pr + cr, pg + cg, pb + cb
        lum = LUM_R * tr + LUM_G * tg + LUM_B * tb
        l2_ref[:] = (l2v + lum * lum).reshape(1, n)


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "max_path_length", "aa_noise_type",
        "block_size", "interpret", "split_point", "stub", "with_stats",
        "sobol_dims", "env_skip",
    ),
)
def render_megastep_pallas(
    scene: Scene,
    settings,  # RenderSettings
    params: NifParams,
    cols: jnp.ndarray,  # (P,) f32 pixel columns
    rows: jnp.ndarray,
    seed: jnp.ndarray | None = None,  # (2,) int32 per-step seed words
    *,
    noise: jnp.ndarray | None = None,  # (S, 4+4L, P) host-noise parity mode
    sobol: tuple | None = None,  # (pixel_id, base, key_bits) Owen-Sobol mode
    sobol_dims: int = 0,
    budgets: jnp.ndarray | None = None,  # (G,) int32 per-block sample counts
    with_stats: bool = False,  # also return per-record lum^2 sums
    width: int,
    height: int,
    max_path_length: int,
    aa_noise_type: str = "normal",
    block_size: int = MEGASTEP_BLOCK,  # see the constant's derivation note
    interpret: bool = False,
    split_point: int | None = None,  # probe knob (scripts/megastep_splitpoint)
    stub: str | None = None,  # 'nif'/'trace'/'both': devtime in-kernel split
    env_skip: bool = False,  # elide NIF for all-dead blocks (_env_contrib)
) -> MegaStepOut:
    """Render settings.samples_per_step samples of every pixel, fused.

    Exactly one of ``seed``/``noise``.  With ``noise`` the kernel runs
    its python-unrolled host-noise parity mode: noise[s] carries sample
    s's randomness in the trace kernel's layout ([0:2] AA jitter,
    [2:4] lens uniforms, [4+4i:8+4i] bounce-i uniforms).  Returns the
    SUM of radiance (env light applied) and path lengths over samples.

    ``budgets`` (adaptive sampling, render/adaptive.py) gives each grid
    block its own sample count instead of settings.samples_per_step: the
    hardware-PRNG loop bound per block, or a contribution gate on the
    host-noise rows (which must then cover max(budgets) samples).
    ``with_stats`` additionally accumulates, per record, the sum over
    its samples of luminance(radiance)^2 (returned as ``lum2``) - the
    second moment the adaptive controller's variance estimate needs.

    With ``sobol=(pixel_id, base, key_bits)`` (int32 (P,) pixel ids,
    int32 (P,) per-lane accumulated sample counts, int32 scalar
    scramble-key bits) and ``sobol_dims > 0``, sample s of the step
    draws its first sobol_dims dims from each lane's Owen-Sobol sequence
    at index base + s (render/qmc.py) and the rest from the hardware
    PRNG - --sampler sobol's production path.
    """
    if (seed is None) == (noise is None):
        raise ValueError("pass exactly one of seed= or noise=")
    if (sobol is not None) != (sobol_dims > 0):
        raise ValueError("sobol= and sobol_dims>0 go together")
    if sobol is not None and noise is not None:
        raise ValueError("sobol mode is hardware mode (host noise already "
                         "carries sobol rows)")
    if block_size % 128:
        raise ValueError(f"block_size must be a multiple of 128, got {block_size}")
    p = cols.shape[0]
    host_samples = 0 if noise is None else int(noise.shape[0])
    if noise is not None and host_samples == 0:
        # Degenerate host-noise request: zero samples -> zero sums.
        z = jnp.zeros((p,), jnp.float32)
        return MegaStepOut(radiance=Vec3(z, z, z),
                           path_len=jnp.zeros((p,), jnp.int32),
                           lum2=z if with_stats else None)
    pad = (-p) % block_size
    sob_pid = sob_base = None
    if sobol is not None:
        sob_pid = sobol[0].astype(jnp.int32)
        sob_base = sobol[1].astype(jnp.int32)
    if pad:
        cols = jnp.pad(cols, (0, pad))
        rows = jnp.pad(rows, (0, pad))
        if noise is not None:
            noise = jnp.pad(noise, ((0, 0), (0, 0), (0, pad)))
        if sobol is not None:
            sob_pid = jnp.pad(sob_pid, (0, pad))
            sob_base = jnp.pad(sob_base, (0, pad))
    n = p + pad
    grid = (n // block_size,)
    if budgets is not None and budgets.shape != (grid[0],):
        raise ValueError(
            f"budgets shape {budgets.shape} != one per grid block ({grid[0]},)")

    from ..models.quant import QuantNifParams

    num_s = scene.num_spheres
    num_d = scene.disc_radius.shape[0]
    sph, dsc = pack_scene(scene)
    num_layers = len(params.kernels)
    quant = isinstance(params, QuantNifParams)

    half_fov = settings.fov * 0.5
    fpar = jnp.stack(
        [
            jnp.tan(half_fov),
            jnp.tan((float(height) / float(width)) * half_fov),
            settings.aa_scale,
            settings.refractive_index,
            settings.stop_prob,
            settings.aperture,
            settings.focal_distance,
            jnp.zeros((), jnp.float32),
        ]
    ).reshape(1, 8)
    if noise is not None:
        s0 = s1 = jnp.zeros((), jnp.int32)
    else:
        seed = jnp.asarray(seed).astype(jnp.int32).reshape(2)
        s0, s1 = seed[0], seed[1]
    zero_i = jnp.zeros((), jnp.int32)
    key_bits = (
        jnp.asarray(sobol[2]).astype(jnp.int32) if sobol is not None else zero_i
    )
    ipar = jnp.stack(
        [
            settings.roulette_depth.astype(jnp.int32),
            s0,
            s1,
            settings.samples_per_step.astype(jnp.int32),
            key_bits,
            zero_i,
            zero_i,
            zero_i,
        ]
    ).reshape(1, 8)
    # Feature-major weights (transposed once; XLA folds it after call 1):
    if quant:
        from .nif_pallas import _pack_scal_q, pack_quant_operands

        kernels_t, biases_c, mults_c, mskip_c, skip_layer = (
            pack_quant_operands(params))
        scal = _pack_scal_q(params, settings.azimuth)
        tail = mults_c + [mskip_c]
    else:
        kernels_t = [w.T for w in params.kernels]
        biases_c = [b.reshape(-1, 1) for b in params.biases]
        scal = _pack_scal(params, settings.azimuth)
        tail = []
        skip_layer = -1

    smem = lambda a: pl.BlockSpec(
        a.shape, lambda i: tuple([0] * a.ndim), memory_space=pltpu.SMEM
    )
    full = lambda a: pl.BlockSpec(
        a.shape, lambda i: tuple([0] * a.ndim), memory_space=pltpu.VMEM
    )
    vec = pl.BlockSpec((block_size,), lambda i: (i,), memory_space=pltpu.VMEM)
    row_out = lambda rows_: pl.BlockSpec(
        (rows_, block_size), lambda i: (0, i), memory_space=pltpu.VMEM
    )

    in_specs = [
        smem(fpar), smem(ipar), smem(scal), smem(sph), smem(dsc), vec, vec,
        *[full(w) for w in kernels_t],
        *[full(b) for b in biases_c],
        *[full(m) for m in tail],
    ]
    inputs = [fpar, ipar, scal, sph, dsc, cols, rows, *kernels_t, *biases_c,
              *tail]
    if budgets is not None:
        # Full (G, 1) table in SMEM, indexed by program_id in-kernel:
        bud2 = budgets.astype(jnp.int32).reshape(-1, 1)
        in_specs.append(smem(bud2))
        inputs.append(bud2)
    if sobol is not None:
        in_specs += [vec, vec]
        inputs += [sob_pid, sob_base]
    if noise is not None:
        in_specs.append(
            pl.BlockSpec(
                (noise.shape[0], noise.shape[1], block_size),
                lambda i: (0, 0, i), memory_space=pltpu.VMEM,
            )
        )
        inputs.append(noise)

    out_shape = [
        jax.ShapeDtypeStruct((3, n), jnp.float32),
        jax.ShapeDtypeStruct((1, n), jnp.int32),
    ]
    out_specs = [row_out(3), row_out(1)]
    if with_stats:
        out_shape.append(jax.ShapeDtypeStruct((1, n), jnp.float32))
        out_specs.append(row_out(1))

    outs = pl.pallas_call(
        functools.partial(
            _kernel, num_s, num_d, max_path_length, num_layers,
            params.embedding_dim, width, height, aa_noise_type, host_samples,
            sobol_dims, interpret, split_point, stub, budgets is not None,
            with_stats, env_skip, quant, skip_layer,
        ),
        out_shape=tuple(out_shape),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        # Grid blocks are independent (the PRNG reseeds per block), so
        # megacore TPUs may split them across TensorCores:
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(*inputs)

    acc, plen = outs[0], outs[1]
    return MegaStepOut(
        radiance=Vec3(acc[0, :p], acc[1, :p], acc[2, :p]),
        path_len=plen[0, :p],
        lum2=outs[2][0, :p] if with_stats else None,
    )
