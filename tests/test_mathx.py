"""Polynomial atan2/acos vs numpy over the full quadrant space."""

import numpy as np
import jax.numpy as jnp

from ipu_path_trace_tpu.ops.mathx import acos, atan2


def test_atan2_all_quadrants():
    rng = np.random.default_rng(0)
    y = rng.uniform(-5, 5, 20000).astype(np.float32)
    x = rng.uniform(-5, 5, 20000).astype(np.float32)
    # Include axes and the origin:
    y[:5] = [0.0, 0.0, 1.0, -1.0, 0.0]
    x[:5] = [1.0, -1.0, 0.0, 0.0, 0.0]
    got = np.asarray(atan2(jnp.asarray(y), jnp.asarray(x)))
    want = np.arctan2(y, x)
    # x<0, y=0 is the branch cut: ours gives +pi like numpy's +0.0 case.
    mask = ~((x < 0) & (y == 0))
    # Quadrant reflections (pi - r) cost ~1 ulp of pi on top of the
    # ~2e-7 polynomial error:
    np.testing.assert_allclose(got[mask], want[mask], atol=4e-6)
    assert abs(got[1] - np.pi) < 4e-6


def test_acos_range():
    x = np.linspace(-1.0, 1.0, 20001).astype(np.float32)
    got = np.asarray(acos(jnp.asarray(x)))
    np.testing.assert_allclose(got, np.arccos(x), atol=2e-6)
