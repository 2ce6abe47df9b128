"""NIF width sweep: train / PSNR / bench MXU-shaped widths.

The canonical 320-wide NIF pads to 384 on the 128-lane MXU, wasting
~17% of the dominant cost (docs/PERF.md roofline).  This sweep trains
the alternatives with the SAME recipe on the same HDRI and measures the
honest tradeoff (r3 verdict item 2):

  256-wide  exactly 2x128: no padding, ~half the padded FLOPs of 320
  320-wide  the reference's canonical width (pads to 384)
  384-wide  exactly 3x128: same padded matmul shapes as 320 except the
            skip layer (432 in -> pads 512 vs 368 -> 384), +20% capacity

For each width: train on assets/procedural_sky.exr, PSNR of the
reconstructed env map vs the source (log-radiance domain - the NIF's
own target space; linear HDR PSNR is dominated by the sun disc), and
the fused-megastep render rate at the canonical 1104x1000/300-spp shape.

Run (TPU attached):  python scripts/nif_width_sweep.py [--epochs 300]
Writes docs/NIF_WIDTHS.json and assets/nif_w{256,384}/ directories.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)

WIDTH, HEIGHT = 1104, 1000
SPP = 300


def psnr_log(img: np.ndarray, ref: np.ndarray, eps: float = 1e-8) -> float:
    """PSNR in the log-radiance domain (the NIF's training target)."""
    a = np.log(np.maximum(img, 0.0) + eps)
    b = np.log(np.maximum(ref, 0.0) + eps)
    mse = float(np.mean((a - b) ** 2))
    peak = float(b.max() - b.min())
    return 10.0 * np.log10(peak * peak / mse)


def bench_width(params) -> float:
    """ms/sample of the fused megastep at the canonical shape."""
    from ipu_path_trace_tpu.core.records import make_worklist, to_device_batch
    from ipu_path_trace_tpu.core.scene import default_scene
    from ipu_path_trace_tpu.models.envlight import NifEnv
    from ipu_path_trace_tpu.render.params import RenderSettings, StaticConfig
    from ipu_path_trace_tpu.render.wavefront import make_base_key, render_step

    scene = default_scene()
    env = NifEnv(params=params)
    cfg = StaticConfig(width=WIDTH, height=HEIGHT)
    settings = RenderSettings.make(samples_per_step=SPP)
    work = to_device_batch(make_worklist(WIDTH, HEIGHT))
    sync = jax.jit(lambda w: w.r[0] + w.b[-1])

    out = render_step(scene, settings, cfg, work, make_base_key(0), env)
    float(sync(out))  # compile + warmup
    t0 = time.monotonic()
    reps = 3
    for i in range(reps):
        out = render_step(scene, settings, cfg, out, make_base_key(i + 1), env)
    float(sync(out))
    return (time.monotonic() - t0) / (reps * SPP) * 1e3


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--batch-size", type=int, default=65536)
    p.add_argument("--widths", type=int, nargs="*", default=[256, 320, 384])
    p.add_argument("--archs", type=str, nargs="*", default=[],
                   help="mixed-width archs as dash-separated per-layer "
                        "widths, e.g. 256-128-208-256-128-128 (inputs "
                        "128-aligned; pre-skip width = 80 mod 128 absorbs "
                        "the +4E skip-concat exactly)")
    p.add_argument("--skip-bench", action="store_true")
    p.add_argument("--synthetic-bench", action="store_true",
                   help="no training: bench each spec with random weights "
                        "(identical compute) to validate the MXU cost "
                        "model before spending training time")
    p.add_argument("--eval-assets", type=str, nargs="*", default=[],
                   help="no training: PSNR + bench already-trained asset "
                        "dirs (names under assets/), merging results into "
                        "docs/NIF_WIDTHS.json — resume path for sweeps "
                        "interrupted after save_assets")
    p.add_argument("--cosine-decay", action="store_true")
    p.add_argument("--layer-count", type=int, default=6,
                   help="hidden layers (6 = canonical); the skip concat "
                        "sits at layer_count//2")
    p.add_argument("--embedding-dim", type=int, default=12,
                   help="Fourier embedding dim E (canonical 12). E=16 at "
                        "width 192 makes the skip-concat exactly 256 - "
                        "zero MXU pad, so extra features are kernel-free")
    args = p.parse_args()

    from ipu_path_trace_tpu.film.imageio import read_exr
    from ipu_path_trace_tpu.models.nif import make_params
    from ipu_path_trace_tpu.models.reconstruct import reconstruct_image
    from ipu_path_trace_tpu.models.train_nif import save_assets, train_nif

    src = read_exr(os.path.join(REPO, "assets", "procedural_sky.exr"))
    h, w = src.shape[:2]
    print(f"source HDRI {w}x{h}, device {jax.devices()[0]}", file=sys.stderr)

    specs: list[int | tuple[int, ...]] = list(args.widths)
    specs += [tuple(int(t) for t in a.split("-")) for a in args.archs]

    if args.synthetic_bench:
        from ipu_path_trace_tpu.models.nif import analyse_nif, make_synthetic_nif

        for spec in specs:
            mixed = not isinstance(spec, int)
            layer_count = len(spec) if mixed else args.layer_count
            weights, meta = make_synthetic_nif(
                key=0, hidden=list(spec) if mixed else spec,
                num_hidden=layer_count, skip_layer=layer_count // 2,
                embedding_dim=args.embedding_dim,
            )
            params = make_params(weights, meta, jnp.bfloat16)
            ms = bench_width(params)
            print(json.dumps({
                "width": "-".join(map(str, spec)) if mixed else spec,
                "layers": layer_count,
                "params_kib": round(analyse_nif(weights, 1)["parameters_kib"], 1),
                "ms_per_sample": round(ms, 3),
                "mpaths_per_sec": round(WIDTH * HEIGHT / ms / 1e3, 1),
                "synthetic": True,
            }))
        return 0

    results = []
    if args.eval_assets:
        from ipu_path_trace_tpu.models.nif import analyse_nif, load_nif_assets

        for name in args.eval_assets:
            params, meta, weights = load_nif_assets(
                os.path.join(REPO, "assets", name), jnp.bfloat16
            )
            widths = [l.kernel.shape[1] for l in weights.layers[:-1]]
            mixed = len(set(widths)) > 1
            recon = reconstruct_image(params, h, w)
            q = psnr_log(recon, src)
            ms = None if args.skip_bench else bench_width(params)
            entry = {
                "width": "-".join(map(str, widths)) if mixed else widths[0],
                "layers": len(widths),
                "final_loss": None,
                "psnr_log_db": round(q, 2),
                "ms_per_sample": None if ms is None else round(ms, 3),
                "mpaths_per_sec": None if ms is None
                else round(WIDTH * HEIGHT / ms / 1e3, 1),
                "params_kib": round(analyse_nif(weights, 1)["parameters_kib"], 1),
                "epochs": args.epochs,
                "cosine_decay": args.cosine_decay,
                "note": f"evaluated from assets/{name}",
            }
            if meta.embedding_dimension != 12:
                entry["embedding_dim"] = meta.embedding_dimension
            results.append(entry)
            print(json.dumps(entry))
        specs = []

    for spec in specs:
        mixed = not isinstance(spec, int)
        layer_count = len(spec) if mixed else args.layer_count
        t0 = time.monotonic()
        weights, meta, loss = train_nif(
            src,
            layer_size=list(spec) if mixed else spec,
            layer_count=layer_count,
            skip_layer=layer_count // 2,
            epochs=args.epochs,
            batch_size=args.batch_size,
            cosine_decay=args.cosine_decay,
            embedding_dim=args.embedding_dim,
            seed=0,
            name=os.path.join(REPO, "assets", "procedural_sky.exr"),
        )
        train_s = time.monotonic() - t0
        if mixed:
            size_args = ["--layer-sizes", ",".join(str(w) for w in spec)]
            tag = "nif_m" + "-".join(str(w) for w in spec)
        else:
            size_args = ["--layer-size", str(spec)]
            tag = (f"nif_w{spec}" if layer_count == 6
                   else f"nif_l{layer_count}w{spec}")
        if args.embedding_dim != 12:
            tag += f"e{args.embedding_dim}"
        out_dir = os.path.join(REPO, "assets", tag)
        if not (spec == 320 and layer_count == 6 and args.embedding_dim == 12):
            # Record an actually-replayable CLI invocation (input/out_dir
            # are positionals; include every non-default knob used):
            save_assets(out_dir, weights, meta, [
                "python", "-m", "ipu_path_trace_tpu.models.train_nif",
                "assets/procedural_sky.exr", os.path.relpath(out_dir, REPO),
                "--layer-count", str(layer_count), *size_args,
                "--embedding-dimension", str(args.embedding_dim),
                "--epochs", str(args.epochs),
                "--batch-size", str(args.batch_size),
                *(["--cosine-decay"] if args.cosine_decay else []),
            ])
        params = make_params(weights, meta, jnp.bfloat16)
        recon = reconstruct_image(params, h, w)
        q = psnr_log(recon, src)
        ms = None if args.skip_bench else bench_width(params)
        entry = {
            "width": "-".join(str(w) for w in spec) if mixed else spec,
            "layers": layer_count,
            "final_loss": loss,
            "psnr_log_db": round(q, 2),
            "ms_per_sample": None if ms is None else round(ms, 3),
            "mpaths_per_sec": None if ms is None else round(WIDTH * HEIGHT / ms / 1e3, 1),
            "train_seconds": round(train_s, 1),
            "epochs": args.epochs,
            "cosine_decay": args.cosine_decay,
        }
        if args.embedding_dim != 12:
            entry["embedding_dim"] = args.embedding_dim
        results.append(entry)
        print(json.dumps(entry))

    out_path = os.path.join(REPO, "docs", "NIF_WIDTHS.json")
    key = lambda e: (int(e.get("layers", 6)), str(e["width"]),
                     int(e.get("embedding_dim", 12)))
    merged: dict[tuple, dict] = {}
    extra: dict = {}
    if os.path.exists(out_path):
        try:
            data = json.load(open(out_path))
            if isinstance(data, dict):  # {"procedural_sky": [...], ...}
                extra = {k: v for k, v in data.items() if k != "procedural_sky"}
                data = data.get("procedural_sky", [])
            for e in data:
                merged[key(e)] = e
        except (ValueError, KeyError):
            pass
    for e in results:
        merged[key(e)] = e
    table = [merged[k] for k in sorted(merged)]
    with open(out_path, "w") as f:
        json.dump({"procedural_sky": table, **extra} if extra else table,
                  f, indent=2)
    print(f"wrote {out_path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
