"""On-device per-phase timing - the cycle-counter analog.

The reference wraps its path-trace compute set, the NIF exec, and the
whole iteration in device cycle counters streamed back per step
(reference: src/PathTracerApp.cpp:438-462,470-475).  XLA offers no
in-program cycle counter, so the split is measured the reliable way:
each phase is looped INSIDE one jitted program (separate host dispatches
pay ~10 ms of tunnel latency each, swamping device time) and timed with
a scalar-fetch barrier (block_until_ready can return early through
tunneled transports - CLAUDE.md).

When production runs the FUSED megastep (NIF env + use_fused_step on
TPU), the split comes from the kernel that actually runs, via in-kernel
stubs (StaticConfig.megastep_stub / ops/megastep_pallas._stub_*):

  step_ms  = the real production step (render_step_impl, full kernel)
  nif-stub = same kernel with the NIF matmul chain stubbed out
  skeleton = same kernel with NIF + bounce loop both stubbed

  trace component = nif-stub - skeleton;  NIF component = full - nif-stub

Meshes are supported: the phases are timed through the sharded step
(shard_map ∘ pallas_call) and reported per chip.  For the unfused paths
the two standalone kernels are timed instead (no overlap claim is
derived from them - kernel-launch deltas are not overlap).

``measure_phases`` runs at the real render shape; the app logs it when
``--device-timing`` is set and it is quoted in README/PERF notes.
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


def measure_phases(scene, settings, cfg, work, step_key, env, mesh=None,
                   loop: int = 300, reps: int = 2) -> dict[str, float]:
    """Per-sample device time of each phase at the given shapes (ms).

    Returns {"step_ms", "mpaths_per_sec", ...}: for the fused production
    path also "trace_ms" / "env_ms" / "overhead_ms" from the in-kernel
    stub split; for unfused Pallas paths the standalone kernel times.
    ``loop`` samples run inside one dispatch so per-call host latency
    (measured ~35 ms through the tunnel) amortises below 2% - at the
    default 300 (the canonical step size) the headline Mpaths/s here
    reconciles with bench.py within ~2%.
    """
    from ..models.envlight import NifEnv
    from ..render.wavefront import render_step_impl

    n_pixels = int(work.u.shape[0])
    if cfg.pallas_interpret > 0 and cfg.use_pallas:
        # Host-noise parity mode renders exactly cfg.pallas_interpret
        # samples per step regardless of samples_per_step
        # (render/wavefront.render_step_impl), so time that many - else
        # the per-sample division would be off by loop/pallas_interpret.
        loop = int(cfg.pallas_interpret)
        logger().info(
            "device-timing: host-noise mode, timing %d samples/step", loop
        )
    use_pallas = cfg.use_pallas and jax.default_backend() == "tpu"
    fused = use_pallas and cfg.use_fused_step and isinstance(env, NifEnv)
    # Paths per dispatched sample: a samples mesh axis renders the same
    # pixels on every replica (combined spp = per-chip spp * axis size,
    # parallel/mesh.sharded_render_step):
    sample_replicas = mesh.shape["samples"] if mesh is not None else 1
    out: dict[str, float] = {}

    loop_settings = settings._replace(samples_per_step=jnp.int32(loop))
    if mesh is not None:
        from ..parallel.mesh import replicate, shard_work, sharded_render_step

        work = shard_work(work, mesh)
        loop_settings = replicate(loop_settings, mesh)
        n_chips = mesh.devices.size
        key = step_key

        def run_cfg(c):
            # sharded_render_step is already jitted (static cfg + mesh):
            def f():
                o = sharded_render_step(
                    scene, loop_settings, c, work, key, env, mesh
                )
                return o.r[0]

            return _time_scalar(f, reps) / loop
    else:
        n_chips = 1
        key = step_key

        def run_cfg(c):
            stepf = jax.jit(
                lambda w, k: render_step_impl(
                    scene, loop_settings, c, w, k, env
                ).r[0]
            )
            return _time_scalar(lambda: stepf(work, key), reps) / loop

    step_s = run_cfg(cfg)
    out["step_ms"] = step_s * 1e3
    out["mpaths_per_sec"] = n_pixels * sample_replicas / step_s / 1e6
    out["mpaths_per_sec_chip"] = out["mpaths_per_sec"] / n_chips

    if fused:
        # In-kernel split of the kernel that actually runs:
        nif_stub_s = run_cfg(cfg._replace(megastep_stub="nif"))
        skeleton_s = run_cfg(cfg._replace(megastep_stub="both"))
        out["env_ms"] = max(step_s - nif_stub_s, 0.0) * 1e3
        out["trace_ms"] = max(nif_stub_s - skeleton_s, 0.0) * 1e3
        out["overhead_ms"] = skeleton_s * 1e3
    elif use_pallas and mesh is None:
        # Unfused path: time the two standalone kernels.  Mesh runs skip
        # this split - the standalone kernels would run on sharded
        # arrays outside shard_map, which XLA cannot partition; the
        # sharded full-step timing above is still reported.
        from ..ops.nif_pallas import nif_env_shade_pallas
        from ..ops.trace_pallas import trace_sample_pallas

        cols = work.u.astype(jnp.float32)
        rows = work.v.astype(jnp.float32)

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

        out["trace_ms"] = (
            _time_scalar(lambda: trace_loop(cols, rows), reps) / loop * 1e3
        )

        if isinstance(env, NifEnv):
            st = trace_sample_pallas(
                scene, loop_settings, cols, rows,
                jnp.asarray([1, 2], jnp.int32),
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
                        settings.azimuth + 1e-6 * i,
                    )
                    return acc + o.x

                return jax.lax.fori_loop(
                    0, loop, body, jnp.zeros_like(esc_dir.x)
                )[0]

            out["env_ms"] = (
                _time_scalar(lambda: env_loop(esc_dir, esc_w), reps)
                / loop * 1e3
            )
    return out


def log_phase_split(split: dict[str, float]) -> None:
    """Log the measured split (the per-step cycle-count analog)."""
    parts = [f"step={split['step_ms']:.2f}ms/sample",
             f"({split['mpaths_per_sec']:.1f} Mpaths/s"]
    if split.get("mpaths_per_sec_chip") != split["mpaths_per_sec"]:
        parts.append(f"= {split['mpaths_per_sec_chip']:.1f}/chip)")
    else:
        parts[-1] += ")"
    if "trace_ms" in split:
        parts.append(f"trace={split['trace_ms']:.2f}ms")
    if "env_ms" in split:
        parts.append(f"nif-env={split['env_ms']:.2f}ms")
    if "overhead_ms" in split:
        parts.append(f"other={split['overhead_ms']:.2f}ms")
    logger().info("Device phase timing: %s", " ".join(parts))
