"""Regenerate ipu_path_trace_tpu/render/_sobol_dirs.py from scipy.

The checked-in module bakes the Joe & Kuo (2008) Sobol direction
numbers (as shipped by scipy.stats.qmc.Sobol, bits=32) for the first
NUM_DIMS dimensions as plain Python ints, so the renderer needs no
scipy at runtime.  Direction numbers are published mathematical data,
not code.

Run:  python scripts/gen_sobol_dirs.py
"""

from __future__ import annotations

import os

import numpy as np

# 4 camera dims (AA jitter x2, lens x2) + 4 per bounce at the default
# --max-path-length 10, rounded up for headroom:
NUM_DIMS = 44
NUM_BITS = 32

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "ipu_path_trace_tpu", "render", "_sobol_dirs.py",
)


def main() -> None:
    from scipy.stats import qmc

    sv = np.asarray(
        qmc.Sobol(d=NUM_DIMS, scramble=False, bits=NUM_BITS)._sv,
        dtype=np.uint64,
    )
    assert sv.shape == (NUM_DIMS, NUM_BITS), sv.shape
    lines = [
        '"""Sobol direction numbers (Joe & Kuo 2008), generated file.',
        "",
        "Regenerate with scripts/gen_sobol_dirs.py (requires scipy).",
        f"DIRS[d][k] is the 32-bit direction number v_k for dimension d",
        f"({NUM_DIMS} dims x {NUM_BITS} index bits).",
        '"""',
        "",
        "DIRS = (",
    ]
    for d in range(NUM_DIMS):
        row = ", ".join(f"0x{int(v):08x}" for v in sv[d])
        lines.append(f"    ({row}),")
    lines.append(")")
    lines.append("")
    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {OUT}: {NUM_DIMS} dims x {NUM_BITS} bits")


if __name__ == "__main__":
    main()
