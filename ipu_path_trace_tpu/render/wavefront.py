"""The wavefront path-trace step: one jittable program per render step.

This replaces the reference's per-tile megakernel pipeline
(gen-rays -> path-trace -> pre-process -> NIF -> apply-env -> accumulate,
reference: src/PathTracerApp.cpp:432-458) with a single SPMD program over
the whole pixel batch:

  * ray-gen: AA jitter + pixel_to_ray over the SoA worklist
    (codelets.cpp:36-80)
  * bounce loop: lax.scan over max_path_length with per-lane alive masks
    replacing the divergent per-ray while loop (codelets.cpp:173-216)
  * throughput accumulation runs forwards - provably equal to the
    reference's backward contribution-stack walk (codelets.cpp:261-292):
    products commute, and radiance is only deposited at EMIT/ESCAPED
    terminals
  * escaped rays record direction + throughput; the environment light
    (constant / texture / NIF MLP) is applied afterwards to the whole
    batch at once - the deferral the reference implements with
    Pre/PostProcessEscapedRays (codelets.cpp:312-385), which on TPU turns
    the NIF into one large MXU matmul
  * the on-device sample loop (popops::countedForLoop,
    PathTracerApp.cpp:466-468) is a lax.scan over sample indices.

RNG is counter-based (threefry keys derived from (step key, sample,
bounce)) instead of the reference's pre-generated noise pools
(PathTracerApp.cpp:285-299).  The derivation is a pure function, so the
NumPy oracle can replay the identical stream for bit-near-exact tests.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.camera import aa_noise, pixel_to_ray
from ..core.envmap import equirect_uv
from ..core.geometry import intersect_scene
from ..core.materials import (
    DIFFUSE_SCALE,
    REFRACT_WEIGHT,
    reflect,
    refract,
    sample_diffuse,
)
from ..core.records import WorkBatch
from ..core.scene import Material, Scene
from ..core.vecmath import Vec3
from ..models.envlight import eval_env
from .params import RenderSettings, StaticConfig

# Key-derivation tags (shared with the CPU oracle in cpu/oracle.py):
AA_TAG = 0x0AA
LENS_TAG = 0x1E5
BOUNCE_TAG = 0xB0


class QmcCtx(NamedTuple):
    """Per-lane context for the Owen-Sobol sampler (render/qmc.py).

    ``base`` is each lane's accumulated sample count (the worklist's own
    sampleCount field), so sample s of this step draws Sobol point
    base + s of the lane's scrambled sequence - continuous across
    progressive steps, restarts, checkpoints and per-block adaptive
    budgets.  ``key`` is the render-wide scramble key
    (settings.sobol_key).
    """

    pixel_id: jnp.ndarray  # (P,) int32 v * width + u
    base: jnp.ndarray  # (P,) int32 accumulated per-lane sample counts
    key: jnp.ndarray  # uint32 scalar


def make_qmc_ctx(work: WorkBatch, cfg, settings) -> QmcCtx | None:
    if cfg.sampler != "sobol":
        return None
    pixel_id = work.v.astype(jnp.int32) * cfg.width + work.u.astype(jnp.int32)
    return QmcCtx(pixel_id=pixel_id, base=work.sample_count.astype(jnp.int32),
                  key=settings.sobol_key)


def sobol_dims_used(cfg) -> int:
    """Leading noise-layout rows carried by the Sobol sequence: a whole
    number of bounces after the 4 camera dims, capped by the layout."""
    if cfg.sampler != "sobol":
        return 0
    d = max(4, (cfg.sobol_dims // 4) * 4)
    return min(d, 4 + 4 * cfg.max_path_length)


def apply_thin_lens(d: Vec3, settings, l1, l2) -> tuple[Vec3, Vec3]:
    """Thin-lens camera: jitter the origin on a disk, refocus through the
    focus plane at ``focal_distance`` along -z.  Aperture 0 degenerates
    exactly to the reference's pinhole ((o, d) unchanged).

    ``d`` must be normalised; (l1, l2) are per-ray uniforms in [0, 1).
    Returns (origin, direction).
    """
    r = settings.aperture * jnp.sqrt(l1)
    phi = (2.0 * jnp.pi) * l2
    lx = r * jnp.cos(phi)
    ly = r * jnp.sin(phi)
    # Focus point of the pinhole ray on the plane z = -focal_distance:
    t_f = settings.focal_distance / jnp.maximum(-d.z, 1e-8)
    o = Vec3(lx, ly, jnp.zeros_like(lx))
    new_d = Vec3(d.x * t_f - lx, d.y * t_f - ly, d.z * t_f).normalized()
    # Keep the pinhole case BIT-exact (renormalisation would flip last
    # ulps and break exact-replay oracle tests):
    dof = settings.aperture > 0.0
    return o.where(dof, Vec3.zeros(lx.shape)), new_d.where(dof, d)


def resolve_rng_impl(rng_impl: str = "auto") -> str:
    """``auto`` -> hardware RngBitGenerator on TPU, threefry elsewhere."""
    if rng_impl == "auto":
        return "rbg" if jax.default_backend() == "tpu" else "threefry2x32"
    return rng_impl


def make_base_key(seed: int, rng_impl: str = "auto") -> jax.Array:
    """Base PRNG key for a render.

    ``auto`` picks XLA's hardware RngBitGenerator (``rbg``) on TPU - the
    threefry key schedule costs ~20% of the whole trace loop there - and
    ``threefry2x32`` elsewhere, which is reproducible across backends and
    is what the NumPy oracle replays (cpu/oracle.py).  Both are
    counter-based, the TPU analog of poprand's per-tile streams
    (reference: src/PathTracerApp.cpp:266-299).
    """
    return jax.random.key(seed, impl=resolve_rng_impl(rng_impl))


def sample_key(base_key: jax.Array, sample_idx) -> jax.Array:
    return jax.random.fold_in(base_key, sample_idx)


def bounce_uniforms(skey: jax.Array, bounce_idx, n: int) -> jnp.ndarray:
    """(4, n) uniforms for one bounce: [rr, bsdf_u1, bsdf_u2, fresnel]."""
    kb = jax.random.fold_in(skey, BOUNCE_TAG + bounce_idx)
    return jax.random.uniform(kb, (4, n), jnp.float32)


class _BounceState(NamedTuple):
    o: Vec3
    d: Vec3
    throughput: Vec3
    radiance: Vec3
    alive: jnp.ndarray
    esc_dir: Vec3
    esc_w: Vec3  # throughput * rrFactor at escape (zero if not escaped)
    escaped: jnp.ndarray
    path_len: jnp.ndarray  # int32 pushes (reference pathLength semantics)


def initial_state(o: Vec3, d: Vec3, n: int) -> _BounceState:
    return _BounceState(
        o=o,
        d=d,
        throughput=Vec3.full((n,), 1.0, 1.0, 1.0),
        radiance=Vec3.zeros((n,)),
        alive=jnp.ones((n,), bool),
        esc_dir=Vec3.zeros((n,)),
        esc_w=Vec3.zeros((n,)),
        escaped=jnp.zeros((n,), bool),
        path_len=jnp.zeros((n,), jnp.int32),
    )


def bounce_body(
    scene: Scene, settings: RenderSettings, state: _BounceState, rnd, bounce_idx
) -> _BounceState:
    """One wavefront bounce over the whole batch with masked lanes.

    ``rnd`` is (4, n): [rr, bsdf_u1, bsdf_u2, fresnel].  Shared by the
    lax.scan driver (trace_one_sample), the injected-uniforms driver
    (trace_sample_with_uniforms), and mirrored inside the fused Pallas
    trace kernel (ops/trace_pallas.py).
    """
    n = state.o.x.shape[0]
    rr_rand, u1, u2, fresnel_rand = rnd[0], rnd[1], rnd[2], rnd[3]

    # Russian roulette (codelets.cpp:175-180): kicks in at
    # depth >= roulette_depth; survivors weighted by 1/(1-p).
    rr_on = bounce_idx >= settings.roulette_depth
    rr_stop = rr_on & (rr_rand <= settings.stop_prob)
    rr_factor = jnp.where(rr_on, 1.0 / (1.0 - settings.stop_prob), 1.0)
    alive = state.alive & ~rr_stop

    hit = intersect_scene(scene, state.o, state.d)

    # Escaped rays: record direction + weighted throughput for the
    # deferred environment lookup (codelets.cpp:185-189).
    escaped_now = alive & ~hit.valid
    esc_dir = state.d.where(escaped_now, state.esc_dir)
    esc_w = (state.throughput * rr_factor).where(escaped_now, state.esc_w)
    escaped = state.escaped | escaped_now

    # Emitters terminate the path (codelets.cpp:192-196):
    emit_now = alive & hit.valid & hit.emissive
    emit_add = state.throughput.cwise(hit.emission) * rr_factor
    radiance = state.radiance + emit_add.where(emit_now, Vec3.zeros((n,)))

    alive = alive & hit.valid & ~hit.emissive

    # BSDF sampling with masked lanes (codelets.cpp:198-213):
    d_diff, cos_theta = sample_diffuse(hit.normal, u1, u2)
    d_spec = reflect(state.d, hit.normal)
    d_refr, refracted = refract(
        state.d, hit.normal, settings.refractive_index, fresnel_rand
    )

    is_diff = hit.material == int(Material.DIFFUSE)
    is_spec = hit.material == int(Material.SPECULAR)
    new_d = d_diff.where(is_diff, d_spec.where(is_spec, d_refr))

    one = Vec3.full((n,), 1.0, 1.0, 1.0)
    # Throughput multipliers (contribution weights of codelets.cpp:198-213
    # applied forwards):
    w_diff = hit.colour * (cos_theta * DIFFUSE_SCALE * rr_factor)
    w_spec = one * rr_factor
    tint = hit.colour.where(refracted, one)
    w_refr = tint * (REFRACT_WEIGHT * rr_factor)
    scale = w_diff.where(is_diff, w_spec.where(is_spec, w_refr))

    throughput = state.throughput.cwise(scale).where(alive, state.throughput)
    new_o = hit.point.where(alive, state.o)
    new_d = new_d.where(alive, state.d)

    # pathLength counts stack pushes: one per scatter/terminal event
    # (TraceRecord semantics via resizeContributionArray,
    # WrappedArray.hpp:45-68, codelets.cpp:253).
    pushed = escaped_now | emit_now | alive
    path_len = state.path_len + pushed.astype(jnp.int32)

    return _BounceState(
        o=new_o,
        d=new_d,
        throughput=throughput,
        radiance=radiance,
        alive=alive,
        esc_dir=esc_dir,
        esc_w=esc_w,
        escaped=escaped,
        path_len=path_len,
    )


def sample_noise(
    skey: jax.Array,
    n: int,
    cfg: StaticConfig,
    qmc_ctx: QmcCtx | None = None,
    sample_idx=None,
) -> jnp.ndarray:
    """(4 + 4L, n) noise for one sample in the Pallas kernels' host-noise
    layout: [0:2] AA jitter (already distributed), [2:4] lens uniforms,
    [4+4b:8+4b] bounce-b uniforms.

    prng mode draws with the exact fold_in schedule of
    trace_one_sample's XLA branch, so host-noise kernel runs replay the
    same streams.  sobol mode (qmc_ctx given; sample_idx = the sample's
    index within the step) fills the first sobol_dims_used(cfg) rows
    from each lane's Owen-Sobol sequence at index base + sample_idx
    (render/qmc.py) and pads the rest with the prng schedule - the
    identical integer math the kernels run in-kernel, so hardware-mode
    sobol renders replay these rows bitwise.
    """
    qd = sobol_dims_used(cfg) if qmc_ctx is not None else 0
    if qd == 0:
        aa = aa_noise(jax.random.fold_in(skey, AA_TAG), (2, n), cfg.aa_noise_type)
        lens = jax.random.uniform(jax.random.fold_in(skey, LENS_TAG), (2, n))
        bounce = [bounce_uniforms(skey, b, n) for b in range(cfg.max_path_length)]
        return jnp.concatenate([aa, lens, *bounce], axis=0)

    from ..ops.trace_pallas import draw_aa_jitter
    from .qmc import sobol_uniforms

    idx = qmc_ctx.base + jnp.int32(0 if sample_idx is None else sample_idx)
    us = sobol_uniforms(idx, qmc_ctx.pixel_id, qmc_ctx.key, range(qd))
    # AA rows carry the TRANSFORMED jitter; the Box-Muller / clip / 2u-1
    # transform is the kernels' own (trace_pallas.draw_aa_jitter), so the
    # in-kernel sobol path computes the identical values:
    a1, a2 = draw_aa_jitter(lambda k: us[:k], cfg.aa_noise_type)
    sobol_rows = jnp.stack([a1, a2, us[2], us[3], *us[4:qd]])  # (qd, n)
    prng_tail = [
        bounce_uniforms(skey, b, n)  # (4, n) each
        for b in range((qd - 4) // 4, cfg.max_path_length)
    ]
    return jnp.concatenate([sobol_rows, *prng_tail], axis=0)


def step_noise(
    step_key: jax.Array,
    n: int,
    cfg: StaticConfig,
    samples: int | None = None,
    qmc_ctx: QmcCtx | None = None,
) -> jnp.ndarray:
    """(S, 4 + 4L, n) host noise for S = ``samples`` (default
    cfg.pallas_interpret) samples."""
    return jnp.stack(
        [
            sample_noise(sample_key(step_key, s), n, cfg, qmc_ctx, s)
            for s in range(cfg.pallas_interpret if samples is None else samples)
        ]
    )


# Interpret-mode Pallas blocks stay small: block size only affects
# padding waste in host-noise mode (per-block PRNG seeding is off), and
# the tests' mesh shards are tiny.
_INTERPRET_BLOCK = 256


def _kernel_sobol(cfg, ctx: QmcCtx, sample_idx):
    """(pixel_id, idx, key_bits) operands for the kernels' in-kernel
    sobol mode; key rides SMEM as its int32 bit pattern."""
    idx = ctx.base + jnp.int32(0 if sample_idx is None else sample_idx)
    key_bits = jax.lax.bitcast_convert_type(
        jnp.asarray(ctx.key, jnp.uint32), jnp.int32
    )
    return ctx.pixel_id, idx, key_bits


def trace_sample_with_uniforms(
    scene: Scene,
    settings: RenderSettings,
    cfg: StaticConfig,
    cols: jnp.ndarray,
    rows: jnp.ndarray,
    aa: jnp.ndarray,  # (2, P) anti-alias jitter (already distributed)
    lens: jnp.ndarray,  # (2, P) lens-disk uniforms in [0, 1)
    uniforms: jnp.ndarray,  # (L, 4, P) per-bounce uniforms
) -> _BounceState:
    """Statically-unrolled trace with injected randomness.

    The exact-parity twin of the fused Pallas kernel's host-RNG mode
    (ops/trace_pallas.py) - both consume identical noise, so results
    match to float-associativity.
    """
    c = cols + settings.aa_scale * aa[0]
    r = rows + settings.aa_scale * aa[1]
    d = pixel_to_ray(c, r, cfg.width, cfg.height, settings.fov).normalized()
    o, d = apply_thin_lens(d, settings, lens[0], lens[1])
    state = initial_state(o, d, cols.shape[0])
    for i in range(cfg.max_path_length):
        state = bounce_body(scene, settings, state, uniforms[i], i)
    return state


def dead_block_fraction(
    scene: Scene,
    settings: RenderSettings,
    cfg: StaticConfig,
    cols: jnp.ndarray,
    rows: jnp.ndarray,
    base_key: jax.Array,
    n_samples: int,
    block_size: int,
) -> float:
    """Fraction of kernel blocks whose escape weights are ALL zero.

    The exact criterion the megastep's dead-block env-skip guard tests
    per (block, sample) iteration (ops/megastep_pallas._env_contrib):
    escape weights are path throughputs (>= 0), so a zero block sum
    means the whole NIF matmul chain would be elided for that block.
    Traced with the XLA twin (trace_sample_with_uniforms) on whatever
    backend the caller placed ``scene``/``cols`` on - the app's auto
    --env-skip probe runs it on the host CPU backend so the decision
    never touches the TPU.  Padding lanes (the kernel pads the tail
    block) escape nothing, matching the kernel's padded layout.
    """
    n = cols.shape[0]
    nblk = -(-n // block_size)

    @jax.jit
    def one(skey):
        noise = sample_noise(skey, n, cfg)
        st = trace_sample_with_uniforms(
            scene, settings, cfg, cols, rows, noise[0:2], noise[2:4],
            noise[4:].reshape(cfg.max_path_length, 4, n))
        w = st.esc_w.x + st.esc_w.y + st.esc_w.z
        w = jnp.pad(w, (0, nblk * block_size - n))
        return jnp.mean((w.reshape(nblk, block_size).sum(axis=1) == 0.0)
                        .astype(jnp.float32))

    total = 0.0
    for s in range(n_samples):
        total += float(one(sample_key(base_key, s)))
    return total / max(1, n_samples)


def trace_one_sample(
    scene: Scene,
    settings: RenderSettings,
    cfg: StaticConfig,
    cols: jnp.ndarray,  # (P,) float32 pixel columns (worklist u)
    rows: jnp.ndarray,  # (P,) float32 pixel rows (worklist v)
    skey: jax.Array,
    env,
    qmc_ctx: QmcCtx | None = None,  # sobol-mode per-lane context
    sample_idx=None,  # sobol mode: the sample's index within the step
) -> tuple[Vec3, jnp.ndarray]:
    """Trace one sample per worklist entry; returns (radiance, path_len)."""
    n = cols.shape[0]

    sobol = cfg.sampler == "sobol" and qmc_ctx is not None
    host_noise = cfg.pallas_interpret > 0
    interp = host_noise and jax.default_backend() != "tpu"
    pallas_on = cfg.use_pallas and (jax.default_backend() == "tpu" or interp)
    if pallas_on:
        # Fused megakernel: per-ray state stays in VMEM for the whole
        # bounce loop (ops/trace_pallas.py).  Seeded per sample from the
        # fold_in key so samples stay independent.  Host-noise mode
        # (cfg.pallas_interpret > 0) replays the XLA branch's streams:
        # the real kernel on TPU, the emulated kernel elsewhere.
        from ..ops.trace_pallas import trace_sample_pallas

        if host_noise:
            state = trace_sample_pallas(
                scene, settings, cols, rows,
                noise=sample_noise(skey, n, cfg, qmc_ctx, sample_idx),
                width=cfg.width, height=cfg.height,
                max_path_length=cfg.max_path_length,
                aa_noise_type=cfg.aa_noise_type,
                block_size=_INTERPRET_BLOCK if interp else 4096,
                interpret=interp,
            )
        else:
            seed = jax.random.bits(skey, (2,), jnp.uint32).astype(jnp.int32)
            state = trace_sample_pallas(
                scene, settings, cols, rows, seed,
                sobol=_kernel_sobol(cfg, qmc_ctx, sample_idx) if sobol else None,
                sobol_dims=sobol_dims_used(cfg) if sobol else 0,
                width=cfg.width, height=cfg.height,
                max_path_length=cfg.max_path_length,
                aa_noise_type=cfg.aa_noise_type,
            )
    elif sobol:
        # Owen-Sobol streams are pre-assembled in the host-noise layout
        # and consumed by the injected-uniforms driver - one code path
        # for the XLA branch, the kernels' host-noise mode and the
        # oracle's stream replay.
        noise = sample_noise(skey, n, cfg, qmc_ctx, sample_idx)
        state = trace_sample_with_uniforms(
            scene, settings, cfg, cols, rows,
            noise[0:2], noise[2:4],
            noise[4:].reshape(cfg.max_path_length, 4, n),
        )
    else:
        # --- ray generation (GenerateCameraRays, codelets.cpp:47-79) ---
        kaa = jax.random.fold_in(skey, AA_TAG)
        noise = aa_noise(kaa, (2, n), cfg.aa_noise_type)
        c = cols + settings.aa_scale * noise[0]
        r = rows + settings.aa_scale * noise[1]
        d = pixel_to_ray(c, r, cfg.width, cfg.height, settings.fov).normalized()
        lens = jax.random.uniform(jax.random.fold_in(skey, LENS_TAG), (2, n))
        o, d = apply_thin_lens(d, settings, lens[0], lens[1])

        state = initial_state(o, d, n)

        def bounce(state: _BounceState, bounce_idx):
            rnd = bounce_uniforms(skey, bounce_idx, n)
            return bounce_body(scene, settings, state, rnd, bounce_idx), None

        state, _ = jax.lax.scan(
            bounce, state, jnp.arange(cfg.max_path_length, dtype=jnp.int32)
        )

    # --- deferred environment lighting (codelets.cpp:312-385) ---
    from ..models.envlight import NifEnv

    if pallas_on and isinstance(env, NifEnv):
        # Fully fused: equirect + NIF + env-apply in one kernel
        # (ops/nif_pallas._env_shade_kernel).
        from ..ops.nif_pallas import nif_env_shade_pallas

        if interp:
            contribution = nif_env_shade_pallas(
                env.params, state.esc_dir, state.esc_w, settings.azimuth,
                block_size=_INTERPRET_BLOCK, interpret=True,
            )
        else:
            contribution = nif_env_shade_pallas(
                env.params, state.esc_dir, state.esc_w, settings.azimuth
            )
        return state.radiance + contribution, state.path_len

    u, v = equirect_uv(state.esc_dir, settings.azimuth)
    # Zero the non-escaped lanes like PreProcessEscapedRays does to avoid
    # FP garbage (codelets.cpp:348-352):
    u = jnp.where(state.escaped, u, 0.0)
    v = jnp.where(state.escaped, v, 0.0)
    env_rgb = eval_env(env, u, v, use_pallas=cfg.use_pallas)
    radiance = state.radiance + state.esc_w.cwise(env_rgb)
    return radiance, state.path_len


def render_step_impl(
    scene: Scene,
    settings: RenderSettings,
    cfg: StaticConfig,
    work: WorkBatch,
    step_key: jax.Array,
    env,
    sample_axis_index=0,
) -> WorkBatch:
    """Run cfg.samples_per_step samples and accumulate into the worklist.

    The device-side sampling loop is the analog of the reference's
    on-device countedForLoop over path-trace iterations
    (PathTracerApp.cpp:466-468).  Accumulation matches
    AccumulateContributions (codelets.cpp:294-300): rgb sums, sampleCount
    increments, pathLength sums.

    ``sample_axis_index`` (traced scalar) is this replica's position on
    a "samples" mesh axis: sobol mode offsets each lane's sequence index
    by index * samples_per_step so replicas draw DISJOINT slices of the
    per-pixel sequence (the worklist's psum'd sampleCount is the global
    count, so the slices line up across steps).  prng mode decorrelates
    via the step key instead (parallel/mesh.local_step) and ignores it.
    """
    cols = work.u.astype(jnp.float32)
    rows = work.v.astype(jnp.float32)
    qmc_ctx = make_qmc_ctx(work, cfg, settings)
    if qmc_ctx is not None:
        off = jnp.int32(sample_axis_index) * settings.samples_per_step.astype(jnp.int32)
        qmc_ctx = qmc_ctx._replace(base=qmc_ctx.base + off)

    from ..models.envlight import NifEnv

    host_noise = cfg.pallas_interpret > 0
    interp = host_noise and jax.default_backend() != "tpu"
    pallas_on = cfg.use_pallas and (jax.default_backend() == "tpu" or interp)
    if pallas_on and cfg.use_fused_step and isinstance(env, NifEnv):
        # Fully fused step: the sample loop, the trace, and the NIF run
        # in ONE kernel, software-pipelined so the trace's VPU work hides
        # behind the NIF matmuls (ops/megastep_pallas.py docstring).
        # cfg.pallas_interpret > 0 switches to host-noise mode replaying
        # the XLA branch's exact streams: on TPU the REAL kernel runs
        # (deterministic cross-backend replay on hardware); elsewhere
        # the same kernel runs emulated (interpret) - including inside
        # shard_map on the virtual CPU mesh.
        from ..ops.megastep_pallas import render_megastep_pallas

        if host_noise:
            # block_size only overridden for emulation; on TPU the
            # kernel's tuned default applies (single source of truth).
            kw = {"block_size": _INTERPRET_BLOCK} if interp else {}
            out = render_megastep_pallas(
                scene, settings, env.params, cols, rows,
                noise=step_noise(step_key, cols.shape[0], cfg, qmc_ctx=qmc_ctx),
                width=cfg.width, height=cfg.height,
                max_path_length=cfg.max_path_length,
                aa_noise_type=cfg.aa_noise_type,
                interpret=interp,
                stub=cfg.megastep_stub or None,
                env_skip=cfg.env_skip,
                **kw,
            )
            spp = jnp.int32(cfg.pallas_interpret)
        else:
            seed = jax.random.bits(step_key, (2,), jnp.uint32).astype(jnp.int32)
            out = render_megastep_pallas(
                scene, settings, env.params, cols, rows, seed,
                sobol=(
                    _kernel_sobol(cfg, qmc_ctx, None)
                    if qmc_ctx is not None else None
                ),
                sobol_dims=sobol_dims_used(cfg),
                width=cfg.width, height=cfg.height,
                max_path_length=cfg.max_path_length,
                aa_noise_type=cfg.aa_noise_type,
                stub=cfg.megastep_stub or None,
                env_skip=cfg.env_skip,
            )
            spp = settings.samples_per_step
        return WorkBatch(
            u=work.u,
            v=work.v,
            r=work.r + out.radiance.x,
            g=work.g + out.radiance.y,
            b=work.b + out.radiance.z,
            sample_count=work.sample_count + spp,
            path_length=work.path_length + out.path_len,
        )

    def body(sample_idx, carry):
        rad, plen = carry
        skey = sample_key(step_key, sample_idx)
        r, p = trace_one_sample(
            scene, settings, cfg, cols, rows, skey, env, qmc_ctx, sample_idx
        )
        return (rad + r, plen + p)

    init = (Vec3.zeros(cols.shape), jnp.zeros(cols.shape, jnp.int32))
    # Dynamic trip count = the streamed deviceSampleLimit analog
    # (PathTracerApp.cpp:466-468); fori_loop keeps it a runtime value.
    rad, plen = jax.lax.fori_loop(0, settings.samples_per_step, body, init)

    return WorkBatch(
        u=work.u,
        v=work.v,
        r=work.r + rad.x,
        g=work.g + rad.y,
        b=work.b + rad.z,
        sample_count=work.sample_count + settings.samples_per_step,
        path_length=work.path_length + plen,
    )


# Single-chip entry point; multi-chip goes through parallel.mesh which
# wraps render_step_impl in a shard_map.
render_step = partial(jax.jit, static_argnames=("cfg",))(render_step_impl)
