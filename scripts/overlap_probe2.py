"""Probe 2: which megastep ingredient kills VPU/MXU overlap?

Variants of the interleaved matmul+VPU kernel (overlap_probe.py k_both),
each adding one megastep ingredient:
  base      : grid-level iteration, pure chains      (known to overlap)
  loop      : in-kernel lax.fori_loop over 16 iters
  loop+prng : + one prng_random_bits call per iteration
  loop+state: + ~12 extra live carry vectors (register pressure)
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

B = 4096
GRID = 270
LOOP = 16
LAYERS = [(320, 48), (320, 320), (320, 320), (320, 368), (320, 320), (320, 320), (3, 320)]
VPU_ROUNDS = 28


def _vpu_round(x):
    x = jnp.sin(x) * 1.1 + jnp.sqrt(jnp.abs(x) + 0.3)
    return jnp.where(x > 1.0, x * 0.5, x + 0.25)


def _interleaved(v, feats, w_refs, extra_vpu_per_layer):
    x = feats
    for i, w in enumerate(w_refs):
        wv = w[:]
        if x.shape[0] != wv.shape[1]:
            x = jnp.concatenate([x, feats[: wv.shape[1] - x.shape[0]]], axis=0)
        x = jnp.dot(wv, x, preferred_element_type=jnp.float32)
        if i != len(w_refs) - 1:
            x = jnp.maximum(x, 0.0).astype(jnp.bfloat16)
        for _ in range(extra_vpu_per_layer):
            v = _vpu_round(v)
    return v + x[0].astype(jnp.float32)


def k_loop(prng: bool, state: bool, u_ref, *refs):
    w_refs, out_ref = refs[:-1], refs[-1]
    n = u_ref.shape[0]
    if prng:
        pltpu.prng_seed(7, pl.program_id(0))
    per = max(1, VPU_ROUNDS // len(LAYERS))

    def body(i, carry):
        acc, extras = carry
        v = u_ref[:] + acc * 1e-6
        if prng:
            # Same draw shape as the real kernel (make_uniform_fn, k=4):
            bits = pltpu.bitcast(pltpu.prng_random_bits((32, n // 8)), jnp.uint32)
            top = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32)
            v = v + top.reshape(4, n)[0] * 1e-9
        feats = jnp.broadcast_to(v.astype(jnp.bfloat16), (48, B))
        r = _interleaved(v, feats, w_refs, per)
        if state:
            new_extras = tuple(_vpu_round(e) + r * 1e-9 for e in extras)
        else:
            new_extras = extras
        return (acc + r, new_extras)

    n_extra = 12 if state else 1
    extras = tuple(u_ref[:] * (1.0 + 0.01 * k) for k in range(n_extra))
    acc, extras = jax.lax.fori_loop(0, LOOP, body, (jnp.zeros((B,), jnp.float32), extras))
    out_ref[:] = (acc + sum(extras)).reshape(1, B)


def build(prng, state):
    ws = [np.random.default_rng(i).normal(size=(o, i_)).astype(np.float16) * 0.05
          for i, (o, i_) in enumerate(LAYERS)]
    ws = [jnp.asarray(w, jnp.bfloat16) for w in ws]
    u = jnp.linspace(0.0, 1.0, GRID * B, dtype=jnp.float32)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple([0] * a.ndim),
                                  memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        functools.partial(k_loop, prng, state),
        out_shape=jax.ShapeDtypeStruct((1, GRID * B), jnp.float32),
        grid=(GRID,),
        in_specs=[pl.BlockSpec((B,), lambda i: (i,), memory_space=pltpu.VMEM),
                  *[full(w) for w in ws]],
        out_specs=pl.BlockSpec((1, B), lambda i: (0, i), memory_space=pltpu.VMEM),
    )

    @jax.jit
    def run(u):
        return f(u, *ws)[0, 0]
    return run, u


def timeit(name, prng=False, state=False):
    run, u = build(prng, state)
    float(run(u))
    t0 = time.monotonic()
    for _ in range(3):
        float(run(u))
    dt = (time.monotonic() - t0) / (3 * LOOP)
    print(f"{name:14s} {dt*1e3:8.2f} ms/iter")
    return dt


timeit("loop")
timeit("loop+prng", prng=True)
timeit("loop+state", state=True)
timeit("loop+both", prng=True, state=True)
