"""Adaptive per-block sampling: spend samples where the variance is.

A TPU-native extension BEYOND the reference (which always renders a
uniform per-step sample count, reference: src/PathTracerApp.cpp:466-468).
The motivation is measured, not hypothetical: at the default scene ~65%
of pixels are sky whose per-sample cost is dominated by the NIF env
MLP - the most expensive part of the whole step (docs/PERF.md) - yet
their luminance variance is near zero after a handful of samples.  A
uniform sampler keeps feeding the MXU samples whose contribution to
image error is nil.

The SIMD-correct granularity is the fused megastep's grid block (the
unit that lives in VMEM together and dies together - the same
granularity the dead-block early-out exploits), NOT the per-ray
priority queues a MIMD machine would use:

  * the kernel accumulates, per record, the second moment of per-sample
    luminance (``with_stats`` in ops/megastep_pallas.py; one extra VPU
    multiply-add per sample),
  * the controller (all jnp, runs ON DEVICE - no host round-trip, so it
    composes with --device-film and with meshes) turns the accumulated
    first/second moments into a per-sample variance estimate and
    allocates the next step's per-block sample budgets by Neyman
    allocation (budget proportional to the block's luminance standard
    deviation - the allocation that minimises total variance for a
    fixed sample budget), floored/capped and renormalised,
  * the megastep runs each block's sample loop to its own budget (the
    hardware-PRNG loop bound is per-block SMEM state).

The estimator stays UNBIASED with no reweighting: the film already
normalises every record by its own int32 sample count
(film/film.py, core/records.py) - per-record sample counts were a
first-class part of the wire format from the start
(reference TraceRecord sampleCount, src/TraceRecord.hpp).

Determinism: budgets are a pure function of the accumulated render
state, and the per-block PRNG streams are seeded by (step seed, block
index) with one draw per sample - so a resumed render recomputes the
identical budgets and replays the identical streams
(tests/test_adaptive.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.records import WorkBatch
from ..ops.megastep_pallas import LUM_B, LUM_G, LUM_R
from .params import StaticConfig

# Must match render_megastep_pallas's tuned default (ops/megastep_pallas.py)
# and wavefront's interpret-mode override - the budgets are per kernel
# grid block, so the controller has to agree with the kernel on blocking.
TPU_BLOCK = 2048


def adaptive_block_size(cfg: StaticConfig) -> int:
    """The kernel grid blocking the controller must agree with - the
    single source for both adaptive_render_step_impl and tooling."""
    host_noise = cfg.pallas_interpret > 0
    interp = host_noise and jax.default_backend() != "tpu"
    from .wavefront import _INTERPRET_BLOCK

    return _INTERPRET_BLOCK if interp else TPU_BLOCK


def compute_budgets(
    r: jnp.ndarray,
    g: jnp.ndarray,
    b: jnp.ndarray,
    lum2: jnp.ndarray,
    sample_count: jnp.ndarray,
    *,
    block_size: int,
    samples_per_step,  # int or traced int32: the per-record average budget
    min_spp,  # int or traced int32 floor
    max_spp,  # int or traced int32 cap
) -> jnp.ndarray:
    """Per-block sample budgets for the next step (all jnp; runs on device).

    Per record, the accumulated sums give the per-sample luminance
    variance  var_i = E[l^2] - E[l]^2;  blocks are scored by
    sigma_g = sqrt(sum_i var_i) and budgets allocated proportionally
    (Neyman allocation), floored at ``min_spp``, capped at ``max_spp``
    with one redistribution pass, and rounded to int32.  The total is
    G * samples_per_step (same per-step cost as the uniform sampler).
    Cold start (no samples yet) or a degenerate zero-variance frame
    falls back to the uniform budget.
    """
    p = r.shape[0]
    pad = (-p) % block_size
    nf = jnp.maximum(sample_count.astype(jnp.float32), 1.0)
    lum_mean = (LUM_R * r + LUM_G * g + LUM_B * b) / nf
    var = jnp.maximum(lum2 / nf - lum_mean * lum_mean, 0.0)
    if pad:
        var = jnp.pad(var, (0, pad))
    vb = var.reshape(-1, block_size).sum(axis=1)  # (G,)
    n_blocks = vb.shape[0]
    sigma = jnp.sqrt(vb)

    spp_f = jnp.asarray(samples_per_step).astype(jnp.float32)
    max_f = jnp.asarray(max_spp).astype(jnp.float32)
    min_f = jnp.asarray(min_spp).astype(jnp.float32)
    total = spp_f * n_blocks
    extra = total - min_f * n_blocks  # to distribute by score
    w = sigma / jnp.maximum(sigma.sum(), 1e-30)
    raw = min_f + w * extra
    capped = jnp.minimum(raw, max_f)
    # ONE redistribution pass: hand what the cap clipped to the UNCAPPED
    # blocks in proportion to their score (never to zero-variance
    # blocks).  Residual the spill itself pushes past the cap is
    # DROPPED, not re-spilled - so whenever caps bind, the step spends
    # slightly under the nominal total (budget, not contract; the mean
    # measured at the canonical config is 127.8 vs the nominal 128,
    # docs/ADAPTIVE.json).
    shortfall = jnp.maximum(raw - capped, 0.0).sum()
    spill_w = jnp.where(raw < max_f, sigma, 0.0)
    spill_w = spill_w / jnp.maximum(spill_w.sum(), 1e-30)
    capped = jnp.minimum(capped + spill_w * shortfall, max_f)
    budgets = jnp.clip(jnp.round(capped), min_f, max_f).astype(jnp.int32)

    uniform = jnp.full((n_blocks,), 1, jnp.int32) * jnp.asarray(
        samples_per_step
    ).astype(jnp.int32)
    # f32 sum: an int32 count sum wraps on long renders (1M records x
    # 100k spp >> 2^31) and could spuriously trip the cold-start branch.
    fallback = (sample_count.astype(jnp.float32).sum() == 0.0) | (
        sigma.sum() <= 0.0)
    return jnp.where(fallback, uniform, budgets)


def adaptive_render_step_impl(
    scene,
    settings,  # RenderSettings
    cfg: StaticConfig,
    work: WorkBatch,
    lum2: jnp.ndarray,  # (P,) f32 accumulated second moments
    step_key: jax.Array,
    env,
    sample_axis_index=0,  # "samples"-axis replica id (sobol index offset)
) -> tuple[WorkBatch, jnp.ndarray]:
    """One adaptive render step; returns (work', lum2').

    Budgets derive from the ACCUMULATED state (work sums + lum2), so the
    whole step - controller included - is one jittable device program,
    and a checkpoint of (work, lum2) resumes bitwise-identically.
    Requires the fused Pallas megastep (NIF env on TPU, or host-noise
    interpret mode elsewhere - render/wavefront.render_step_impl's
    exact kernel-selection rules).
    """
    from ..models.envlight import NifEnv
    from ..ops.megastep_pallas import render_megastep_pallas
    from .wavefront import _kernel_sobol, make_qmc_ctx, sobol_dims_used, step_noise

    if not isinstance(env, NifEnv):
        raise ValueError("adaptive sampling requires the NIF environment "
                         "light (the fused megastep)")
    host_noise = cfg.pallas_interpret > 0
    interp = host_noise and jax.default_backend() != "tpu"
    pallas_on = cfg.use_pallas and (jax.default_backend() == "tpu" or interp)
    if not (pallas_on and cfg.use_fused_step):
        raise ValueError(
            "adaptive sampling requires the fused Pallas megastep (TPU, or "
            "pallas_interpret host-noise mode elsewhere)")

    block = adaptive_block_size(cfg)
    cols = work.u.astype(jnp.float32)
    rows = work.v.astype(jnp.float32)
    p = cols.shape[0]
    # Owen-Sobol composes for free: per-lane indices are the worklist's
    # own sample counts, so a block whose budget was smaller simply
    # resumes its lanes' sequences further behind (render/qmc.py):
    qmc_ctx = make_qmc_ctx(work, cfg, settings)

    def offset_ctx(ctx, budgets):
        # Sample-axis replicas draw DISJOINT slices of each lane's
        # sobol sequence: replicas hold identical moments, so budgets
        # (and hence slices) agree across the axis
        # (render/wavefront.render_step_impl's uniform analog).
        if ctx is None:
            return None
        inc = jnp.repeat(budgets, block)[:p].astype(jnp.int32)
        return ctx._replace(
            base=ctx.base + jnp.int32(sample_axis_index) * inc)

    if host_noise:
        # Host-noise parity mode: the noise array must cover the budget
        # cap; the kernel gates rows >= budget (megastep docstring).
        spp = int(cfg.pallas_interpret)
        cap = max(int(round(cfg.adaptive_max_factor * spp)), spp)
        budgets = compute_budgets(
            work.r, work.g, work.b, lum2, work.sample_count,
            block_size=block, samples_per_step=spp,
            min_spp=min(cfg.adaptive_min, spp), max_spp=cap,
        )
        qmc_ctx = offset_ctx(qmc_ctx, budgets)
        out = render_megastep_pallas(
            scene, settings, env.params, cols, rows,
            noise=step_noise(step_key, p, cfg, samples=cap, qmc_ctx=qmc_ctx),
            budgets=budgets, with_stats=True,
            width=cfg.width, height=cfg.height,
            max_path_length=cfg.max_path_length,
            aa_noise_type=cfg.aa_noise_type,
            block_size=block, interpret=interp,
            env_skip=cfg.env_skip,
        )
    else:
        spp = settings.samples_per_step
        cap = jnp.maximum(
            jnp.round(cfg.adaptive_max_factor * spp.astype(jnp.float32)),
            spp.astype(jnp.float32),
        ).astype(jnp.int32)
        budgets = compute_budgets(
            work.r, work.g, work.b, lum2, work.sample_count,
            block_size=block, samples_per_step=spp,
            # An interactive spp below the configured floor must still
            # work (the budget floor can never exceed the average):
            min_spp=jnp.minimum(jnp.int32(cfg.adaptive_min), spp),
            max_spp=cap,
        )
        seed = jax.random.bits(step_key, (2,), jnp.uint32).astype(jnp.int32)
        qmc_ctx = offset_ctx(qmc_ctx, budgets)
        out = render_megastep_pallas(
            scene, settings, env.params, cols, rows, seed,
            sobol=(
                _kernel_sobol(cfg, qmc_ctx, None)
                if qmc_ctx is not None else None
            ),
            sobol_dims=sobol_dims_used(cfg),
            budgets=budgets, with_stats=True,
            width=cfg.width, height=cfg.height,
            max_path_length=cfg.max_path_length,
            aa_noise_type=cfg.aa_noise_type,
            env_skip=cfg.env_skip,
        )

    inc = jnp.repeat(budgets, block)[:p]
    new_work = WorkBatch(
        u=work.u,
        v=work.v,
        r=work.r + out.radiance.x,
        g=work.g + out.radiance.y,
        b=work.b + out.radiance.z,
        sample_count=work.sample_count + inc,
        path_length=work.path_length + out.path_len,
    )
    return new_work, lum2 + out.lum2


def _jit_adaptive(fn):
    from functools import partial

    return partial(jax.jit, static_argnames=("cfg",))(fn)


adaptive_render_step = _jit_adaptive(adaptive_render_step_impl)
