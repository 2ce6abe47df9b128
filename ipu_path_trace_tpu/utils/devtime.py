"""On-device per-phase timing - the cycle-counter analog.

The reference wraps its path-trace compute set, the NIF exec, and the
whole iteration in device cycle counters streamed back per step
(reference: src/PathTracerApp.cpp:438-462,470-475).  XLA offers no
in-program cycle counter, so the split is measured the reliable way:
each phase is looped INSIDE one jitted program (separate host dispatches
pay ~10 ms of tunnel latency each, swamping device time) and timed with
a scalar-fetch barrier (block_until_ready can return early through
tunneled transports - CLAUDE.md).

``measure_phases`` runs at the real render shape and returns the
trace / NIF-env / full-step split in ms per sample; the app logs it when
``--device-timing`` is set and it is quoted in README perf notes.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from .logging import logger


def _time_scalar(fn, reps: int) -> float:
    """Median-free simple timing: warmup + reps, scalar-fetch barrier."""
    float(fn())  # compile + warmup
    t0 = time.monotonic()
    for _ in range(reps):
        float(fn())
    return (time.monotonic() - t0) / reps


def measure_phases(scene, settings, cfg, work, step_key, env,
                   loop: int = 8, reps: int = 2) -> dict[str, float]:
    """Per-sample device time of each phase at the given shapes (ms).

    Returns {"trace_ms", "env_ms", "step_ms", "mpaths_per_sec"}; the env
    phase is only measured for NIF env lights (it is negligible for
    constant/texture envs).
    """
    from ..models.envlight import NifEnv
    from ..ops.nif_pallas import nif_env_shade_pallas
    from ..ops.trace_pallas import trace_sample_pallas
    from ..render.wavefront import render_step_impl

    cols = work.u.astype(jnp.float32)
    rows = work.v.astype(jnp.float32)
    n_pixels = int(cols.shape[0])
    use_pallas = cfg.use_pallas and jax.default_backend() == "tpu"
    out: dict[str, float] = {}

    loop_settings = settings._replace(samples_per_step=jnp.int32(loop))

    if use_pallas:
        @jax.jit
        def trace_loop(cols, rows):
            def body(i, acc):
                st = trace_sample_pallas(
                    scene, loop_settings, cols, rows, jnp.stack([i, i + 7]),
                    width=cfg.width, height=cfg.height,
                    max_path_length=cfg.max_path_length,
                    aa_noise_type=cfg.aa_noise_type,
                )
                return (acc[0] + st.radiance.x, acc[1] + st.esc_w.x)
            z = jnp.zeros_like(cols)
            acc = jax.lax.fori_loop(0, loop, body, (z, z))
            return acc[0][0] + acc[1][0]

        out["trace_ms"] = _time_scalar(lambda: trace_loop(cols, rows), reps) / loop * 1e3

        if isinstance(env, NifEnv):
            st = trace_sample_pallas(
                scene, loop_settings, cols, rows, jnp.asarray([1, 2], jnp.int32),
                width=cfg.width, height=cfg.height,
                max_path_length=cfg.max_path_length,
                aa_noise_type=cfg.aa_noise_type,
            )
            esc_dir, esc_w = st.esc_dir, st.esc_w

            @jax.jit
            def env_loop(esc_dir, esc_w):
                def body(i, acc):
                    o = nif_env_shade_pallas(
                        env.params, esc_dir, esc_w,
                        loop_settings.azimuth + 1e-6 * i,
                    )
                    return acc + o.x
                return jax.lax.fori_loop(0, loop, body, jnp.zeros_like(esc_dir.x))[0]

            out["env_ms"] = _time_scalar(lambda: env_loop(esc_dir, esc_w), reps) / loop * 1e3

    @jax.jit
    def step(work, key):
        return render_step_impl(scene, loop_settings, cfg, work, key, env).r[0]

    step_s = _time_scalar(lambda: step(work, step_key), reps) / loop
    out["step_ms"] = step_s * 1e3
    out["mpaths_per_sec"] = n_pixels / step_s / 1e6
    return out


def log_phase_split(split: dict[str, float]) -> None:
    """Log the measured split (the per-step cycle-count analog)."""
    parts = [f"step={split['step_ms']:.2f}ms/sample",
             f"({split['mpaths_per_sec']:.1f} Mpaths/s)"]
    if "trace_ms" in split:
        parts.append(f"trace={split['trace_ms']:.2f}ms")
    if "env_ms" in split:
        parts.append(f"nif-env={split['env_ms']:.2f}ms")
    if "trace_ms" in split and "env_ms" in split:
        overlap = split["trace_ms"] + split["env_ms"] - split["step_ms"]
        parts.append(f"fusion-overlap={overlap:.2f}ms")
    logger().info("Device phase timing: %s", " ".join(parts))
