"""Transcendentals Mosaic does not lower, as VPU-friendly polynomials.

Pallas TPU kernels cannot use jnp.arctan2 / jnp.arccos (no Mosaic
lowering rules), so the fused env-shading kernel evaluates them with a
minimax polynomial in the octant-reduced argument.  Max error ~2e-6 rad
for atan2 (the pi - r quadrant reflection costs ~1 ulp of pi on top of
the ~2e-7 core polynomial) and ~2e-6 for acos over f32 inputs - far below the bf16
quantisation of the NIF that consumes the result.

Plain jnp functions: usable inside Pallas kernels and under jit/XLA
alike (tests run them both ways).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_PI = np.float32(np.pi)
_PI_2 = np.float32(np.pi / 2)

# Minimax coefficients for atan(t), t in [-1, 1] (odd polynomial, degree
# 11; classic f32 set, error < 2e-7 rad):
_A1 = np.float32(0.99997726)
_A3 = np.float32(-0.33262347)
_A5 = np.float32(0.19354346)
_A7 = np.float32(-0.11643287)
_A9 = np.float32(0.05265332)
_A11 = np.float32(-0.01172120)


def _atan_unit(t):
    """atan(t) for |t| <= 1."""
    s = t * t
    p = _A11
    p = p * s + _A9
    p = p * s + _A7
    p = p * s + _A5
    p = p * s + _A3
    p = p * s + _A1
    return p * t


def atan2(y, x):
    """Full-quadrant atan2 via octant reduction (Mosaic-safe).

    Matches jnp.arctan2 conventions for all quadrants and for y == 0;
    x == y == 0 returns 0.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.where(hi > 0.0, hi, 1.0)  # origin -> t=0 -> atan2(0,0)=0
    r = _atan_unit(t)
    # Octant fixups: swap when |y| > |x|, reflect when x < 0, sign of y.
    r = jnp.where(ay > ax, _PI_2 - r, r)
    r = jnp.where(x < 0.0, _PI - r, r)
    return jnp.where(y < 0.0, -r, r)


def acos(x):
    """acos(x) = atan2(sqrt(1 - x^2), x) for x in [-1, 1] (Mosaic-safe)."""
    xc = jnp.clip(x, -1.0, 1.0)
    s = jnp.sqrt(jnp.maximum(1.0 - xc * xc, 0.0))
    return atan2(s, xc)
