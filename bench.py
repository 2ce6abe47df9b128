"""Headline benchmark: Mpaths/sec/chip at 1104x1000 with the NIF env light.

The canonical demo config of the reference (1104x1000, 300 samples per
step - reference: README.md:82) rendered on one chip.  A "path" is one
camera sample (the reference's samples/sec metric,
src/PathTracerApp.cpp:766-770).  Baseline: the driver-assigned target of
50 Mpaths/sec/chip (BASELINE.md).

THE HEADLINE is the canonical 6x320 architecture (the reference's
urban_alley-class NIF, README.md:96), loaded from the reference-scale
on-class asset assets/urban_alley_synth_nif (trained on a deterministic
2048x4096 urban-alley-class env - the reference's content scale).  The
round-3 headline substituted a narrower 6x192 E=16 NIF whose quality
advantage was measured only on a smooth 256x512 sky; the on-class sweep
at 2048x4096 (docs/NIF_WIDTHS.json "urban_alley_synth_2048x4096")
showed the order INVERTS there - 320 wins at 36.29 dB while 192-E16
drops to 31.89 - so no faster width passes the decision rule ("fastest
width whose PSNR >= canonical's ON the metric's content class") and the
canonical config IS the tuned config.  The 192-E16 rate is still
measured and reported (stderr + "offclass_192e16_mpaths" in the JSON)
as an off-class speed point: it remains a legitimate choice for
low-frequency sky-class envs, where it holds 60.15 dB vs 320's 59.2.

Hardening (round-2): canonical 300 spp/step, a >= 10 s timed window
(run-to-run variance < 3%), and a one-shot retry on the transient HTTP
500s the remote TPU compile helper occasionally throws (CLAUDE.md).

Prints ONE json line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

WIDTH, HEIGHT = 1104, 1000
SAMPLES_PER_STEP = 300  # canonical demo step size (reference README.md:82)
MIN_TIMED_SECONDS = 10.0
BASELINE_MPATHS = 50.0
REPO = os.path.dirname(os.path.abspath(__file__))


def _peak_bf16_flops(device) -> float | None:
    """Peak dense bf16 TFLOP/s for the detected chip (public spec sheets).

    Returns None for unknown kinds (e.g. the CPU fallback backend) so the
    metric line omits mfu rather than fabricating a peak.
    """
    kind = getattr(device, "device_kind", "").lower()
    table = {
        "v5 lite": 197e12,   # v5e
        "v5e": 197e12,
        "v5p": 459e12,
        "v4": 275e12,
        "v6 lite": 918e12,   # Trillium
        "v6e": 918e12,
    }
    for name, peak in table.items():
        if name in kind:
            return peak
    return None


def _retry_transient(fn):
    """Run fn(); retry once if the remote compile throws a transient 500."""
    try:
        return fn()
    except Exception as e:  # noqa: BLE001 - narrow by message, not type
        msg = str(e)
        if "500" in msg or "UNAVAILABLE" in msg or "INTERNAL" in msg:
            print(f"bench: transient failure, retrying once: {msg[:200]}",
                  file=sys.stderr)
            return fn()
        raise


def _load_env(asset_dir: str):
    """Returns (env, description) - the description states what actually
    loaded, so the metric line can never misattribute a fallback."""
    from ipu_path_trace_tpu.models.envlight import NifEnv
    from ipu_path_trace_tpu.models.nif import (
        analyse_nif, load_nif_assets, make_params, make_synthetic_nif,
    )

    info = None
    try:
        params, meta, weights = load_nif_assets(asset_dir, jnp.bfloat16)
        info = analyse_nif(weights, 1)
        # layers counts Dense layers incl. the 3-wide output head; the
        # architecture name convention (6x320 etc.) counts hidden layers:
        arch = f"{info['layers'] - 1}x{info['hidden_size']}"
        desc = f"trained {arch} NIF env"
        if meta.embedding_dimension != 12:
            desc += f" (E={meta.embedding_dimension})"
        if os.path.basename(asset_dir) == "urban_alley_synth_nif":
            desc += (" (canonical arch, trained at the reference's "
                     "2048x4096 content scale; on-class PSNR 36.29 dB, "
                     "docs/NIF_WIDTHS.json)")
        print(f"bench NIF: {desc} ({asset_dir})", file=sys.stderr)
    except Exception as e:  # noqa: BLE001 - fall back, report why
        desc = "synthetic 6x320 NIF env (FALLBACK - trained asset failed to load)"
        print(f"bench NIF: {desc}: {e}", file=sys.stderr)
        weights, meta = make_synthetic_nif(key=0)  # canonical 6x320 arch
        params = make_params(weights, meta, jnp.bfloat16)
        info = analyse_nif(weights, 1)
    return NifEnv(params=params), desc, info


def _measure(label: str, env, scene, cfg, settings, work, sync) -> float:
    """Mpaths/s over a >= MIN_TIMED_SECONDS window."""
    from ipu_path_trace_tpu.render.wavefront import make_base_key, render_step

    t0 = time.monotonic()

    def warmup():
        out = render_step(scene, settings, cfg, work, make_base_key(0), env)
        float(sync(out))
        return out

    out = _retry_transient(warmup)
    print(f"[{label}] compile+first step: {time.monotonic() - t0:.1f}s",
          file=sys.stderr)

    t0 = time.monotonic()
    out = render_step(scene, settings, cfg, out, make_base_key(1), env)
    float(sync(out))
    step_s = time.monotonic() - t0
    timed_steps = max(3, int(MIN_TIMED_SECONDS / step_s) + 1)
    print(f"[{label}] step time ~{step_s:.2f}s -> timing {timed_steps} steps",
          file=sys.stderr)

    t0 = time.monotonic()
    for i in range(timed_steps):
        out = render_step(scene, settings, cfg, out, make_base_key(i + 2), env)
    float(sync(out))
    secs = time.monotonic() - t0
    mpaths = WIDTH * HEIGHT * SAMPLES_PER_STEP * timed_steps / secs / 1e6
    print(f"[{label}] timed window: {secs:.1f}s -> {mpaths:.1f} Mpaths/s",
          file=sys.stderr)
    return mpaths


def main() -> None:
    from ipu_path_trace_tpu.core.records import make_worklist, to_device_batch
    from ipu_path_trace_tpu.core.scene import default_scene
    from ipu_path_trace_tpu.render.params import RenderSettings, StaticConfig

    dev = jax.devices()[0]
    print(f"bench device: {dev}", file=sys.stderr)

    # Warm the tunnel transfer paths up front and visibly: the FIRST
    # device->host fetch through the axon tunnel can pay a multi-minute
    # one-time initialisation (CLAUDE.md).  Doing it on a trivial array
    # keeps that cost out of the timed phases and shows progress.
    t0 = time.monotonic()
    _ = float(jnp.sum(jnp.arange(8.0)))
    print(f"tunnel warmup: {time.monotonic() - t0:.1f}s", file=sys.stderr)

    scene = default_scene()
    cfg = StaticConfig(width=WIDTH, height=HEIGHT)
    settings = RenderSettings.make(samples_per_step=SAMPLES_PER_STEP)
    # The app's default coherent layout (runtime/worklist.coherent_order):
    # primary-hit-sorted records let the megastep's dead-block early-out
    # fire block-wise (+3% vs raster, docs/PERF.md).
    from ipu_path_trace_tpu.runtime.worklist import coherent_order

    worklist = coherent_order(make_worklist(WIDTH, HEIGHT), scene,
                              WIDTH, HEIGHT, 90.0)
    work = to_device_batch(worklist)
    # Through tunneled device transports block_until_ready can return
    # before execution finishes; a scalar fetch is a reliable barrier.
    sync = jax.jit(lambda w: w.r[0] + w.b[-1])

    env_canon, desc, nif_info = _load_env(
        os.path.join(REPO, "assets", "urban_alley_synth_nif"))
    headline = _measure("canonical 6x320", env_canon, scene, cfg, settings,
                        work, sync)

    # Off-class speed point (informational): the 192-E16 width that wins
    # on sky-class content but FAILS the on-class PSNR rule at 2048x4096
    # (31.89 vs 36.29 dB, docs/NIF_WIDTHS.json) - kept visible so the
    # speed/quality frontier stays measured:
    offclass = None
    try:
        env_tuned, _, _ = _load_env(os.path.join(REPO, "assets", "nif_w192e16"))
        offclass = _measure("192-E16 off-class", env_tuned, scene, cfg,
                            settings, work, sync)
        print(f"off-class 192-E16 rate: {offclass:.1f} Mpaths/s "
              "(sky-class quality only; fails the on-class rule)",
              file=sys.stderr)
    except Exception as e:  # noqa: BLE001 - secondary number is informational
        print(f"off-class 192-E16 rate skipped: {e}", file=sys.stderr)

    # Context line (stderr): the throughput above is paths/sec; with
    # --adaptive the same kernel converges to equal RMSE ~4x sooner
    # (allocation win, measured separately - docs/ADAPTIVE.json):
    try:
        with open(os.path.join(REPO, "docs", "ADAPTIVE.json")) as f:
            ad = json.load(f)
        print(f"adaptive sampling (--adaptive): time-to-equal-RMSE speedup "
              f"{ad['time_to_quality_speedup']}x at this config "
              f"(docs/ADAPTIVE.json)", file=sys.stderr)
    except Exception:
        pass
    line = {
        "metric": f"Mpaths/sec/chip at 1104x1000, {desc}",
        "value": round(headline, 3),
        "unit": "Mpaths/s",
        "vs_baseline": round(headline / BASELINE_MPATHS, 4),
        "onclass_psnr_db": {"6x320": 36.29, "192e16": 31.89},
    }
    # MFU: each path evaluates the NIF chain once (every ray queries the
    # env light through the fused kernel); flops are per full-frame sample
    # (W*H paths).  "model" counts useful MACs (analyse_nif, the standard
    # MFU numerator); "padded" counts MXU-issued work in the kernel's
    # feature-major layout (contraction dim -> 128 rows, output -> 8
    # sublanes) - the roofline that docs/PERF.md's stub split reconciles
    # against.  Peak is the detected chip's dense bf16 spec.
    peak = _peak_bf16_flops(dev)
    if nif_info is not None:
        per_path_model = float(nif_info["flops"])
        per_path_padded = float(nif_info["padded_flops"])
        line["flops_per_sample_model"] = round(per_path_model * WIDTH * HEIGHT)
        line["flops_per_sample_padded"] = round(per_path_padded * WIDTH * HEIGHT)
        if peak is not None:
            rate = headline * 1e6  # paths/s
            line["mfu"] = round(per_path_model * rate / peak, 4)
            line["mxu_util_padded"] = round(per_path_padded * rate / peak, 4)
            print(f"mfu={line['mfu']} (model flops) "
                  f"mxu_util_padded={line['mxu_util_padded']} "
                  f"(peak {peak / 1e12:.0f} TFLOP/s bf16, {dev.device_kind})",
                  file=sys.stderr)
    if offclass is not None:
        line["offclass_192e16_mpaths"] = round(offclass, 3)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
