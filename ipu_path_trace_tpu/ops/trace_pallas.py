"""The fused path-trace megakernel: one Pallas kernel per sample.

This is the TPU answer to the reference's RayTraceKernel megakernel
(reference: src/codelets/codelets.cpp:93-227): the ENTIRE bounce loop -
camera ray generation, AA jitter, every intersection, BSDF event, and
russian-roulette decision - runs inside a single Pallas kernel, so all
per-ray state (origin, direction, throughput, radiance, masks) lives in
VMEM/registers for all max_path_length bounces.  The XLA wavefront path
(render/wavefront.py) re-materialises that state in HBM once per bounce
because lax.scan iterations cannot fuse across steps; at 1.1M rays that
is ~150 MB of HBM traffic per bounce which this kernel eliminates.

Design notes:

* **Scene and settings ride SMEM.**  Objects are packed into flat f32
  scalar tables (12 floats/sphere, 15 floats/disc) and read back as
  scalars, so the unrolled intersection loop is the same gather-free
  select chain as core/geometry.intersect_scene.
* **RNG is the TPU core's hardware PRNG** (pltpu.prng_seed /
  prng_random_bits), seeded per (sample, grid block).  Uniforms are
  drawn as 24-bit mantissa floats in (0, 1].  Normal AA jitter uses
  Box-Muller; "truncated-normal" clips at +/-3 sigma (the XLA path uses
  an exact inverse-CDF; for a sub-pixel jitter the difference is
  statistically negligible).
* **Host-RNG mode for testability.**  The hardware PRNG does not exist
  in Pallas interpret mode, so `host_noise=True` swaps it for an input
  array of pre-generated noise; render/wavefront.trace_sample_with_uniforms
  consumes the identical array, giving an exact-parity oracle for tests.
* Escaped-ray environment shading stays a SEPARATE fused kernel
  (equirect + NIF + apply, ops/nif_pallas._env_shade_kernel) - mirroring
  the reference's deferral of env lighting to Pre/PostProcessEscapedRays
  (codelets.cpp:312-385) while keeping this kernel env-agnostic.

Bounce semantics are render/wavefront.bounce_body, verbatim.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.geometry import _disc_t, _sphere_t
from ..core.materials import (
    DIFFUSE_SCALE,
    REFRACT_WEIGHT,
    reflect,
    refract,
    sample_diffuse,
)
from ..core.scene import Scene
from ..render import qmc
from ..core.vecmath import Vec3

_INF = np.float32(np.inf)  # plain numpy: jnp constants may not be closure-captured by kernels
_SPHERE_F = 12  # cx cy cz r | cr cg cb | er eg eb | emissive material
_DISC_F = 15  # nx ny nz cx cy cz r | cr cg cb | er eg eb | emissive material
_TWO_PI = 2.0 * np.pi


class TraceOut(NamedTuple):
    radiance: Vec3
    esc_dir: Vec3
    esc_w: Vec3
    escaped: jnp.ndarray  # bool
    path_len: jnp.ndarray  # int32


def pack_scene(scene: Scene) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Flatten the Scene pytree into SMEM scalar tables.

    Empty object classes pack as a (1, 1) dummy table - a zero-width
    SMEM block crashes pallas_call, and the unrolled loops (driven by
    the static counts) never read the dummy.
    """
    num_s = scene.num_spheres
    num_d = scene.disc_radius.shape[0]
    if num_s == 0:
        sph = jnp.zeros((1, 1), jnp.float32)
    if num_d == 0:
        dsc = jnp.zeros((1, 1), jnp.float32)
    if num_s == 0 and num_d == 0:
        return sph, dsc
    if num_s == 0:
        return sph, _pack_discs(scene, num_s, num_d)
    if num_d == 0:
        return _pack_spheres(scene, num_s), dsc
    return _pack_spheres(scene, num_s), _pack_discs(scene, num_s, num_d)


def _pack_spheres(scene: Scene, num_s: int) -> jnp.ndarray:
    return jnp.concatenate(
        [
            scene.sphere_center.reshape(num_s, 3),
            scene.sphere_radius.reshape(num_s, 1),
            scene.colour[:num_s],
            scene.emission[:num_s],
            scene.emissive[:num_s].astype(jnp.float32).reshape(num_s, 1),
            scene.material[:num_s].astype(jnp.float32).reshape(num_s, 1),
        ],
        axis=1,
    ).reshape(1, num_s * _SPHERE_F)


def _pack_discs(scene: Scene, num_s: int, num_d: int) -> jnp.ndarray:
    return jnp.concatenate(
        [
            scene.disc_normal.reshape(num_d, 3),
            scene.disc_center.reshape(num_d, 3),
            scene.disc_radius.reshape(num_d, 1),
            scene.colour[num_s:],
            scene.emission[num_s:],
            scene.emissive[num_s:].astype(jnp.float32).reshape(num_d, 1),
            scene.material[num_s:].astype(jnp.float32).reshape(num_d, 1),
        ],
        axis=1,
    ).reshape(1, num_d * _DISC_F)


def _intersect(sph_ref, dsc_ref, num_s: int, num_d: int, o: Vec3, d: Vec3):
    """Unrolled select-chain intersection from SMEM scalar tables.

    Same math and winner-selection as core/geometry.intersect_scene.
    Returns (valid, point, normal, colour, emission, emissive, material).
    """
    shape = o.x.shape
    best_t = jnp.full(shape, _INF)
    nrm = Vec3.zeros(shape)
    colour = Vec3.zeros(shape)
    emission = Vec3.zeros(shape)
    # Kept as f32 through the select chain - Mosaic cannot select i1
    # vectors - and compared once at the end:
    emissive = jnp.zeros(shape, jnp.float32)
    material = jnp.zeros(shape, jnp.float32)
    win_c = Vec3.zeros(shape)
    won_sphere = jnp.zeros(shape, bool)

    def attrs(ref, base, closer):
        nonlocal colour, emission, emissive, material
        colour = Vec3(
            jnp.where(closer, ref[0, base + 0], colour.x),
            jnp.where(closer, ref[0, base + 1], colour.y),
            jnp.where(closer, ref[0, base + 2], colour.z),
        )
        emission = Vec3(
            jnp.where(closer, ref[0, base + 3], emission.x),
            jnp.where(closer, ref[0, base + 4], emission.y),
            jnp.where(closer, ref[0, base + 5], emission.z),
        )
        emissive = jnp.where(closer, ref[0, base + 6], emissive)
        material = jnp.where(closer, ref[0, base + 7], material)

    for k in range(num_s):
        b = k * _SPHERE_F
        cx, cy, cz = sph_ref[0, b], sph_ref[0, b + 1], sph_ref[0, b + 2]
        t_k = _sphere_t(cx, cy, cz, sph_ref[0, b + 3], o, d)
        closer = t_k < best_t
        best_t = jnp.where(closer, t_k, best_t)
        attrs(sph_ref, b + 4, closer)
        win_c = Vec3(
            jnp.where(closer, cx, win_c.x),
            jnp.where(closer, cy, win_c.y),
            jnp.where(closer, cz, win_c.z),
        )
        won_sphere = won_sphere | closer

    for j in range(num_d):
        b = j * _DISC_F
        nx, ny, nz = dsc_ref[0, b], dsc_ref[0, b + 1], dsc_ref[0, b + 2]
        t_k = _disc_t(
            nx, ny, nz,
            dsc_ref[0, b + 3], dsc_ref[0, b + 4], dsc_ref[0, b + 5],
            dsc_ref[0, b + 6], o, d,
        )
        closer = t_k < best_t
        best_t = jnp.where(closer, t_k, best_t)
        attrs(dsc_ref, b + 7, closer)
        ones = jnp.ones(shape)
        nrm = Vec3(nx * ones, ny * ones, nz * ones).where(closer, nrm)
        won_sphere = won_sphere & ~closer

    valid = best_t < _INF
    t_safe = jnp.where(valid, best_t, 0.0)
    point = Vec3(o.x + d.x * t_safe, o.y + d.y * t_safe, o.z + d.z * t_safe)
    if num_s:
        n_s = point - win_c
        inv = 1.0 / jnp.sqrt(jnp.maximum(n_s.norm2(), 1e-20))
        nrm = (n_s * inv).where(won_sphere, nrm)
    return valid, point, nrm, colour, emission, emissive > 0.5, material


class BounceState(NamedTuple):
    """Per-lane trace state threaded through bounce_once (all (B,) vecs)."""

    o: Vec3
    d: Vec3
    throughput: Vec3
    radiance: Vec3
    alive: jnp.ndarray  # bool
    esc_dir: Vec3
    esc_w: Vec3
    escaped: jnp.ndarray  # bool
    path_len: jnp.ndarray  # int32


def make_uniform_fn(n: int):
    """Hardware-PRNG uniform draw helper for a (n,)-lane kernel block.

    Returns uniforms(k) -> k vectors of (n,) uniforms in (0, 1] (24-bit
    mantissa) drawn in ONE prng call (per-invocation overhead amortised;
    42 separate draws/sample measured slower).
    """

    def uniforms(k: int):
        bits = pltpu.bitcast(pltpu.prng_random_bits((8 * k, n // 8)), jnp.uint32)
        # Logical shift as uint32 clears the sign bit, so the bitcast back
        # to int32 is value-preserving (Mosaic cannot cast uint32 -> f32):
        top24 = pltpu.bitcast(bits >> 8, jnp.int32)
        u = (top24.astype(jnp.float32) + 1.0) * (1.0 / (1 << 24))
        u = u.reshape(k, n)
        return [u[i] for i in range(k)]

    return uniforms


def _bitcast_vec(x: jnp.ndarray, dtype) -> jnp.ndarray:
    """pltpu.bitcast for (B,) vectors (Mosaic rejects 1-D bitcasts)."""
    return pltpu.bitcast(x.reshape(1, -1), dtype).reshape(x.shape)


def sobol_word_kernel(pid: jnp.ndarray, idx: jnp.ndarray, key_u32):
    """In-kernel scrambled-index word for the Owen-Sobol sampler.

    Same math as render/qmc.py (single source of truth for the bit
    mixing); only the int32<->uint32 moves use pltpu.bitcast because
    Mosaic has no integer convert to/from uint32 vectors.  ``pid`` and
    ``idx`` are int32 (B,) vectors; ``key_u32`` a uint32 scalar.
    """
    from ..render import qmc

    pid_u = _bitcast_vec(pid, jnp.uint32)
    idx_u = _bitcast_vec(idx, jnp.uint32)
    return qmc.scrambled_index_word(idx_u, qmc.pixel_seed(pid_u, key_u32))


def sobol_unit_kernel(h: jnp.ndarray, key_u32, dim: int,
                      masks: tuple | None = None) -> jnp.ndarray:
    """One Owen-scrambled Sobol dimension as f32 in (0, 1] (in-kernel
    form of qmc.owen_bits + qmc.bits_to_unit; bit-identical values).

    Pass ``masks=qmc.sobol_masks(h)`` when drawing several dims from
    the same sample so the 32 per-bit masks are computed once (the
    dominant in-kernel QMC cost; see render/qmc.py)."""
    from ..render import qmc

    if masks is None:
        masks = qmc.sobol_masks(h)
    bits = qmc.reverse_bits32(
        qmc.laine_karras(qmc.sobol_bits_shared(h, masks, dim),
                         qmc.dim_seed(key_u32, dim))
    )
    top24 = _bitcast_vec(bits >> 8, jnp.int32)
    return (top24.astype(jnp.float32) + 1.0) * (1.0 / (1 << 24))


def draw_aa_jitter(uniforms, aa_noise_type: str):
    """AA jitter pair from the HW PRNG: uniform, normal (Box-Muller) or
    truncated-normal clipped at +/-3 sigma."""
    if aa_noise_type == "uniform":
        a, b = uniforms(2)
        return 2.0 * a - 1.0, 2.0 * b - 1.0
    u1, u2 = uniforms(2)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    z1 = r * jnp.cos(_TWO_PI * u2)
    z2 = r * jnp.sin(_TWO_PI * u2)
    if aa_noise_type == "truncated-normal":
        z1 = jnp.clip(z1, -3.0, 3.0)
        z2 = jnp.clip(z2, -3.0, 3.0)
    return z1, z2


def raygen(cols, rows, a1, a2, l1, l2, *, width, height,
           tanfov_x, tanfov_y, aa_scale, aperture, focal) -> tuple[Vec3, Vec3]:
    """Camera ray generation (GenerateCameraRays, codelets.cpp:47-79)
    plus the thin-lens DoF extension (wavefront.apply_thin_lens).

    (a1, a2) is the AA jitter pair, (l1, l2) the lens-disk uniforms.
    Returns (origin, direction); pinhole (aperture 0) stays bit-exact.
    """
    shape = cols.shape
    c = cols + aa_scale * a1
    r = rows + aa_scale * a2
    w = jnp.float32(width)
    h = jnp.float32(height)
    dx = ((2.0 * c - w) / w) * tanfov_x
    dy = -((2.0 * r - h) / h) * tanfov_y
    inv = 1.0 / jnp.sqrt(dx * dx + dy * dy + 1.0)
    d = Vec3(dx * inv, dy * inv, -inv)

    lr = aperture * jnp.sqrt(l1)
    lphi = _TWO_PI * l2
    lx = lr * jnp.cos(lphi)
    ly = lr * jnp.sin(lphi)
    t_f = focal / jnp.maximum(-d.z, 1e-8)
    fd = Vec3(d.x * t_f - lx, d.y * t_f - ly, d.z * t_f)
    finv = 1.0 / jnp.sqrt(jnp.maximum(fd.norm2(), 1e-20))
    dof = aperture > 0.0
    o = Vec3(lx, ly, jnp.zeros(shape)).where(dof, Vec3.zeros(shape))
    d = (fd * finv).where(dof, d)
    return o, d


def initial_bounce_state(o: Vec3, d: Vec3) -> BounceState:
    shape = o.x.shape
    return BounceState(
        o=o,
        d=d,
        throughput=Vec3.full(shape, 1.0, 1.0, 1.0),
        radiance=Vec3.zeros(shape),
        alive=jnp.ones(shape, bool),
        esc_dir=Vec3.zeros(shape),
        esc_w=Vec3.zeros(shape),
        escaped=jnp.zeros(shape, bool),
        path_len=jnp.zeros(shape, jnp.int32),
    )


def bounce_once(sph_ref, dsc_ref, num_s: int, num_d: int, st: BounceState,
                rr_rand, u1, u2, fresnel_rand, bounce_idx: int,
                refr_index, stop_prob, roulette_depth) -> BounceState:
    """One wavefront bounce; semantics = render/wavefront.bounce_body."""
    shape = st.o.x.shape
    one = Vec3.full(shape, 1.0, 1.0, 1.0)

    rr_on = jnp.int32(bounce_idx) >= roulette_depth
    rr_stop = rr_on & (rr_rand <= stop_prob)
    rr_factor = jnp.where(rr_on, 1.0 / (1.0 - stop_prob), 1.0)
    alive = st.alive & ~rr_stop

    valid, point, normal, colr, emis, emissive, material = _intersect(
        sph_ref, dsc_ref, num_s, num_d, st.o, st.d
    )

    escaped_now = alive & ~valid
    esc_dir = st.d.where(escaped_now, st.esc_dir)
    esc_w = (st.throughput * rr_factor).where(escaped_now, st.esc_w)
    escaped = st.escaped | escaped_now

    emit_now = alive & valid & emissive
    emit_add = st.throughput.cwise(emis) * rr_factor
    radiance = st.radiance + emit_add.where(emit_now, Vec3.zeros(shape))

    alive = alive & valid & ~emissive

    d_diff, cos_theta = sample_diffuse(normal, u1, u2)
    d_spec = reflect(st.d, normal)
    d_refr, refracted = refract(st.d, normal, refr_index, fresnel_rand)

    is_diff = material < 0.5
    is_spec = (material >= 0.5) & (material < 1.5)
    new_d = d_diff.where(is_diff, d_spec.where(is_spec, d_refr))

    w_diff = colr * (cos_theta * DIFFUSE_SCALE * rr_factor)
    w_spec = one * rr_factor
    tint = colr.where(refracted, one)
    w_refr = tint * (REFRACT_WEIGHT * rr_factor)
    scale = w_diff.where(is_diff, w_spec.where(is_spec, w_refr))

    throughput = st.throughput.cwise(scale).where(alive, st.throughput)
    o = point.where(alive, st.o)
    d = new_d.where(alive, st.d)

    pushed = escaped_now | emit_now | alive
    path_len = st.path_len + pushed.astype(jnp.int32)

    return BounceState(o, d, throughput, radiance, alive, esc_dir, esc_w,
                       escaped, path_len)


def bounce_cond(pred, bounce_fn, st: BounceState) -> BounceState:
    """``lax.cond(pred, bounce_fn, identity, st)`` for kernel use.

    Mosaic crashes lowering scf.if results of i1 vector type (an
    internal layout bug, hit on v5e), so the bool mask fields ride the
    conditional as f32 0/1 and are re-thresholded on both sides.
    """
    packed = st._replace(
        alive=st.alive.astype(jnp.float32),
        escaped=st.escaped.astype(jnp.float32),
    )

    def then_fn(p):
        s = bounce_fn(p._replace(alive=p.alive > 0.5, escaped=p.escaped > 0.5))
        return s._replace(
            alive=s.alive.astype(jnp.float32),
            escaped=s.escaped.astype(jnp.float32),
        )

    out = jax.lax.cond(pred, then_fn, lambda p: p, packed)
    return out._replace(alive=out.alive > 0.5, escaped=out.escaped > 0.5)


def _kernel(
    num_s: int,
    num_d: int,
    max_path_length: int,
    width: int,
    height: int,
    aa_noise_type: str,
    host_noise: bool,
    sobol_dims: int,  # >0: leading dims from the in-kernel Owen-Sobol path
    # refs:
    fpar_ref,  # SMEM (1, 8) f32: tanfov_x tanfov_y aa_scale refr stop_prob aperture focal
    ipar_ref,  # SMEM (1, 4) i32: roulette_depth seed0 seed1 sobol_key
    sph_ref,  # SMEM (1, num_s*12)
    dsc_ref,  # SMEM (1, num_d*15)
    cols_ref,  # VMEM (B,)
    rows_ref,  # VMEM (B,)
    *refs,  # [pid/idx if sobol] + [noise_ref if host_noise] + outputs
):
    i = 0
    pid_ref = idx_ref = noise_ref = None
    if sobol_dims:
        pid_ref, idx_ref = refs[0], refs[1]
        i = 2
    if host_noise:
        noise_ref = refs[i]
        i += 1
    outs = refs[i:]
    rad_ref, escd_ref, escw_ref, escm_ref, plen_ref = outs

    shape = cols_ref.shape
    n = shape[0]
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
    if not host_noise and (not sobol_dims or prng_tail > 0):
        # Two 32-bit seed words so distinct samples cannot birthday-collide
        # in a 32-bit space over long renders; the grid-block id folds into
        # the second word (Mosaic caps prng_seed at 2 values).
        pltpu.prng_seed(ipar_ref[0, 1], ipar_ref[0, 2] + pl.program_id(0))

    uniforms = make_uniform_fn(n)

    # --- camera ray generation (GenerateCameraRays, codelets.cpp:47-79) ---
    # All of the PRNG randomness is drawn in ONE call up front
    # (per-invocation overhead amortised, and the dead-block early-out
    # below must not move the stream position when it skips a bounce).
    # Sobol dims have NO stream position (pure functions of the sample
    # index), so bounce dims are computed lazily inside the unroll and
    # skipped bounces skip their cost too.
    h = key_u = h_masks = None
    if host_noise:
        a1, a2 = noise_ref[0, :], noise_ref[1, :]
        l1, l2 = noise_ref[2, :], noise_ref[3, :]
    elif sobol_dims:
        key_u = ipar_ref[0, 3].astype(jnp.uint32)
        h = sobol_word_kernel(pid_ref[:], idx_ref[:], key_u)
        h_masks = qmc.sobol_masks(h)
        cam = [sobol_unit_kernel(h, key_u, d, h_masks) for d in range(4)]
        rnd_tail = uniforms(prng_tail) if prng_tail else []
        a1, a2 = draw_aa_jitter(lambda k: cam[:k], aa_noise_type)
        l1, l2 = cam[2], cam[3]
    else:
        rnd_all = uniforms(4 + 4 * max_path_length)
        a1, a2 = draw_aa_jitter(lambda k: rnd_all[:k], aa_noise_type)
        l1, l2 = rnd_all[2], rnd_all[3]
    o, d = raygen(
        cols_ref[:], rows_ref[:], a1, a2, l1, l2,
        width=width, height=height, tanfov_x=tanfov_x, tanfov_y=tanfov_y,
        aa_scale=aa_scale, aperture=aperture, focal=focal,
    )
    st = initial_bounce_state(o, d)

    # --- bounce loop, fully unrolled; semantics = wavefront.bounce_body ---
    def bounce_rnd(b):
        if host_noise:
            return [noise_ref[4 + 4 * b + j, :] for j in range(4)]
        if sobol_dims:
            return [
                sobol_unit_kernel(h, key_u, dim, h_masks) if dim < sobol_dims
                else rnd_tail[dim - sobol_dims]
                for dim in range(4 + 4 * b, 8 + 4 * b)
            ]
        return rnd_all[4 + 4 * b : 8 + 4 * b]

    def run_bounces(s, lo, hi):
        for b in range(lo, hi):
            s = bounce_once(
                sph_ref, dsc_ref, num_s, num_d, s, *bounce_rnd(b), b,
                refr_index, stop_prob, roulette_depth,
            )
        return s

    def any_alive(s):
        return jnp.sum(s.alive.astype(jnp.float32)) > 0.0

    # Dead-block early-out: bounce_once is exactly the identity when no
    # lane is alive (every update is where(alive, ...)), and all
    # randomness is drawn up front, so skipping preserves replay
    # semantics.  With a raster-ordered worklist a block is a contiguous
    # image strip; sky strips lose every lane on bounce 0 (94% of paths
    # escape, mean path length 1.6 at the default scene).  Two nested
    # conditionals (not one per bounce - that explodes Mosaic compile
    # time): skip after the primary bounce, and again partway through.
    split = min(1 + (max_path_length - 1) // 3, max_path_length)

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

    rad_ref[:] = jnp.stack([st.radiance.x, st.radiance.y, st.radiance.z], axis=0)
    escd_ref[:] = jnp.stack([st.esc_dir.x, st.esc_dir.y, st.esc_dir.z], axis=0)
    escw_ref[:] = jnp.stack([st.esc_w.x, st.esc_w.y, st.esc_w.z], axis=0)
    escm_ref[:] = st.escaped.astype(jnp.int32).reshape(1, n)
    plen_ref[:] = st.path_len.reshape(1, n)


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "max_path_length", "aa_noise_type",
        "block_size", "interpret", "sobol_dims",
    ),
)
def trace_sample_pallas(
    scene: Scene,
    settings,  # RenderSettings (avoids a circular import)
    cols: jnp.ndarray,  # (P,) f32 pixel columns
    rows: jnp.ndarray,  # (P,) f32 pixel rows
    seed: jnp.ndarray | None = None,  # (2,) int32/uint32 per-sample seed words
    *,
    noise: jnp.ndarray | None = None,  # host-noise mode, see below
    sobol: tuple | None = None,  # (pixel_id, idx, key_bits) Owen-Sobol mode
    sobol_dims: int = 0,
    width: int,
    height: int,
    max_path_length: int,
    aa_noise_type: str = "normal",
    block_size: int = 4096,  # measured fastest on v5e (4096 > 8192 by ~9%)
    interpret: bool = False,
) -> TraceOut:
    """Trace one sample per pixel through the fused megakernel.

    Exactly one of ``seed``/``noise`` must be given.  ``seed`` is a
    (2,)-shaped int32 vector of seed words for the hardware PRNG (two
    words so distinct samples cannot birthday-collide in a 32-bit
    space).  ``noise`` of shape (4 + 4 * max_path_length, P) runs the
    kernel in host-noise mode ([0:2] = AA jitter, [2:4] = lens-disk
    uniforms, [4+4i : 8+4i] = bounce-i uniforms) - the layout of
    render/wavefront.trace_sample_with_uniforms.

    With ``sobol=(pixel_id, idx, key_bits)`` (int32 (P,) pixel ids,
    int32 (P,) per-lane Sobol indices, int32 scalar scramble-key bits)
    and ``sobol_dims > 0``, the first sobol_dims noise dims come from
    the in-kernel Owen-Sobol sampler (render/qmc.py math) and the rest
    from the hardware PRNG seeded by ``seed``.
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
    host_noise = noise is not None
    pad = (-p) % block_size
    sob_pid = sob_idx = None
    if sobol is not None:
        sob_pid = sobol[0].astype(jnp.int32)
        sob_idx = sobol[1].astype(jnp.int32)
    if pad:
        cols = jnp.pad(cols, (0, pad))
        rows = jnp.pad(rows, (0, pad))
        if host_noise:
            noise = jnp.pad(noise, ((0, 0), (0, pad)))
        if sobol is not None:
            sob_pid = jnp.pad(sob_pid, (0, pad))
            sob_idx = jnp.pad(sob_idx, (0, pad))
    n = p + pad
    grid = (n // block_size,)

    num_s = scene.num_spheres
    num_d = scene.disc_radius.shape[0]
    sph, dsc = pack_scene(scene)

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
    if host_noise:
        s0 = s1 = jnp.zeros((), jnp.int32)
    else:
        seed = jnp.asarray(seed).astype(jnp.int32).reshape(2)
        s0, s1 = seed[0], seed[1]
    key_bits = (
        jnp.asarray(sobol[2]).astype(jnp.int32)
        if sobol is not None else jnp.zeros((), jnp.int32)
    )
    ipar = jnp.stack(
        [
            settings.roulette_depth.astype(jnp.int32),
            s0,
            s1,
            key_bits,
        ]
    ).reshape(1, 4)

    smem = lambda a: pl.BlockSpec(
        a.shape, lambda i: tuple([0] * a.ndim), memory_space=pltpu.SMEM
    )
    vec = pl.BlockSpec((block_size,), lambda i: (i,), memory_space=pltpu.VMEM)
    row_out = lambda rows_: pl.BlockSpec(
        (rows_, block_size), lambda i: (0, i), memory_space=pltpu.VMEM
    )

    in_specs = [smem(fpar), smem(ipar), smem(sph), smem(dsc), vec, vec]
    inputs = [fpar, ipar, sph, dsc, cols, rows]
    if sobol is not None:
        in_specs += [vec, vec]
        inputs += [sob_pid, sob_idx]
    if host_noise:
        in_specs.append(
            pl.BlockSpec(
                (noise.shape[0], block_size), lambda i: (0, i),
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(noise)

    rad, escd, escw, escm, plen = pl.pallas_call(
        functools.partial(
            _kernel, num_s, num_d, max_path_length, width, height,
            aa_noise_type, host_noise, sobol_dims,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, n), jnp.float32),
            jax.ShapeDtypeStruct((3, n), jnp.float32),
            jax.ShapeDtypeStruct((3, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(row_out(3), row_out(3), row_out(3), row_out(1), row_out(1)),
        # Grid blocks are independent (the PRNG reseeds per block), so
        # megacore TPUs may split them across TensorCores:
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(*inputs)

    return TraceOut(
        radiance=Vec3(rad[0, :p], rad[1, :p], rad[2, :p]),
        esc_dir=Vec3(escd[0, :p], escd[1, :p], escd[2, :p]),
        esc_w=Vec3(escw[0, :p], escw[1, :p], escw[2, :p]),
        escaped=escm[0, :p] > 0,
        path_len=plen[0, :p],
    )
