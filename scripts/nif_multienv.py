"""Multi-env stability of the on-class width decision rule (VERDICT r4 #2).

The r4 reclassification showed the rule's choice rides on content
class, and the r4 verdict's remaining doubt was that the on-class
evidence was a single env + seed from the builder's own generator.
This script re-runs the rule-relevant architectures (canonical 320 and
the three faster candidates it beat) on ADDITIONAL independent
2048x4096 urban-alley envs - different seeds of models/synth_env.py,
which re-draws the skyline, facade layout, window grids, emitter
placement/intensity and sun position per seed - and reports whether the
rule's ordering (and therefore the shipped headline arch) is stable.

Same matched recipe as scripts/nif_reference_scale.py: 6000 epochs,
batch 65536, 2 steps/epoch, cosine decay, seed-0 init; PSNR at the full
frame with the sweep's log-domain metric.  Megastep rates are
arch-determined (content-independent, docs/PERF.md) so they are not
re-measured here.

Writes docs/NIF_WIDTHS.json section "urban_alley_synth_multienv".

Run (TPU):  python scripts/nif_multienv.py [--seeds 13 23] [--archs ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax.numpy as jnp

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)

from scripts.nif_reference_scale import parse_arch, train_one  # noqa: E402
from scripts.nif_width_sweep import psnr_log  # noqa: E402

SECTION = "urban_alley_synth_multienv"


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, nargs="*", default=[13, 23])
    p.add_argument("--archs", nargs="*",
                   default=["320", "256", "192", "192e16"])
    p.add_argument("--epochs", type=int, default=6000)
    p.add_argument("--batch-size", type=int, default=65536)
    args = p.parse_args()

    from ipu_path_trace_tpu.models.nif import make_params
    from ipu_path_trace_tpu.models.reconstruct import reconstruct_image
    from ipu_path_trace_tpu.models.synth_env import resolve_synth

    out_path = os.path.join(REPO, "docs", "NIF_WIDTHS.json")

    def merge(env_name: str, rows: list[dict]) -> None:
        data = json.load(open(out_path))
        sec = data.setdefault(SECTION, {
            "description": "rule-stability check: the rule-relevant archs "
                           "re-trained on independent 2048x4096 urban-alley "
                           "envs (per-seed skyline/facade/emitter/sun "
                           "re-draws); matched recipe; full-frame PSNR",
            "epochs": args.epochs,
            "envs": {},
        })
        key = lambda e: (str(e["width"]), int(e.get("embedding_dim", 12)))
        merged = {key(e): e for e in sec["envs"].get(env_name, [])}
        for e in rows:
            merged[key(e)] = e
        sec["envs"][env_name] = [merged[k] for k in sorted(merged)]
        with open(out_path, "w") as f:
            json.dump(data, f, indent=2)
            f.write("\n")

    for seed in args.seeds:
        env_name = f"synth:urban-alley:2048x4096:seed{seed}"
        t0 = time.monotonic()
        src = resolve_synth(env_name)
        print(f"env {env_name} generated in {time.monotonic()-t0:.0f}s, "
              f"range {src.min():.3g}..{src.max():.3g}", file=sys.stderr)
        rows = []
        for arch in args.archs:
            width, embed, layers = parse_arch(arch)
            t0 = time.monotonic()
            weights, meta, loss = train_one(src, width, embed, layers,
                                            args.epochs, args.batch_size)
            params = make_params(weights, meta, jnp.bfloat16)
            q = psnr_log(reconstruct_image(params, *src.shape[:2]), src)
            row = {"width": width, "psnr_log_db": round(q, 2),
                   "final_loss": loss,
                   "train_seconds": round(time.monotonic() - t0, 1)}
            if embed != 12:
                row["embedding_dim"] = embed
            rows.append(row)
            print(json.dumps({"env": env_name, **row}))
            merge(env_name, rows)  # survive a mid-run crash

    # Stability report over every recorded env (incl. the original seed7
    # sweep section, which used the identical recipe):
    data = json.load(open(out_path))
    all_envs = {"synth:urban-alley:2048x4096:seed7":
                data["urban_alley_synth_2048x4096"]["results"]}
    all_envs.update(data.get(SECTION, {}).get("envs", {}))
    verdicts = {}
    for env_name, rows in all_envs.items():
        by_arch = {}
        for r in rows:
            tag = str(r["width"]) + (
                f"e{r['embedding_dim']}" if r.get("embedding_dim", 12) != 12
                else "")
            if r.get("layers", 6) == 6:
                by_arch[tag] = r["psnr_log_db"]
        if "320" not in by_arch:
            continue
        canon = by_arch["320"]
        passing = [a for a, q in by_arch.items() if a != "320" and q >= canon]
        verdicts[env_name] = {"canonical_psnr": canon, "others": by_arch,
                              "faster_archs_passing_rule": passing}
        print(json.dumps({"env": env_name, **verdicts[env_name]}))
    stable = all(not v["faster_archs_passing_rule"] for v in verdicts.values())
    print(json.dumps({"rule_choice_stable_across_envs": stable,
                      "envs_checked": len(verdicts)}))
    if SECTION in data:
        data[SECTION]["rule_choice_stable_across_envs"] = stable
        with open(out_path, "w") as f:
            json.dump(data, f, indent=2)
            f.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
