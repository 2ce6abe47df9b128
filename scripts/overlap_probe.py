"""Probe: does Mosaic overlap independent VPU work with MXU matmuls?

Three kernels over identical grids:
  A: NIF-shaped matmul chain only (7 layers, 320 wide, bf16)
  B: heavy VPU-only work (transcendental chain, trace-shaped)
  C: both, independent, interleaved in program order

If time(C) ~= max(A, B) the units overlap and a fused trace+NIF kernel
can hide the trace time behind the NIF matmuls.  If time(C) ~= A + B
they serialise and fusion buys only glue.
"""

from __future__ import annotations


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
GRID = 270  # ~1104x1000 / 4096
LAYERS = [(320, 48), (320, 320), (320, 320), (320, 368), (320, 320), (320, 320), (3, 320)]
VPU_ROUNDS = 30  # tuned to ~trace cost


def _mxu_chain(feats, w_refs):
    x = feats
    for i, w in enumerate(w_refs):
        wv = w[:]
        if x.shape[0] != wv.shape[1]:
            x = jnp.concatenate([x, feats[: wv.shape[1] - x.shape[0]]], axis=0)
        x = jnp.dot(wv, x, preferred_element_type=jnp.float32)
        if i != len(w_refs) - 1:
            x = jnp.maximum(x, 0.0).astype(jnp.bfloat16)
    return x.astype(jnp.float32)


def _vpu_work(u, rounds):
    x = u
    for _ in range(rounds):
        x = jnp.sin(x) * 1.1 + jnp.sqrt(jnp.abs(x) + 0.3)
        x = jnp.where(x > 1.0, x * 0.5, x + 0.25)
    return x


def k_mxu(u_ref, *refs):
    w_refs, out_ref = refs[:-1], refs[-1]
    feats = jnp.broadcast_to(u_ref[:].astype(jnp.bfloat16), (48, B))
    y = _mxu_chain(feats, w_refs)
    out_ref[:] = jnp.broadcast_to(y[0:1], out_ref.shape)


def k_vpu(u_ref, *refs):
    out_ref = refs[-1]
    out_ref[:] = _vpu_work(u_ref[:], VPU_ROUNDS).reshape(1, B)


def k_both(u_ref, *refs):
    w_refs, out_ref = refs[:-1], refs[-1]
    # Independent streams, interleaved in program order: issue matmuls
    # layer by layer with VPU work between them.
    feats = jnp.broadcast_to(u_ref[:].astype(jnp.bfloat16), (48, B))
    x = feats
    v = u_ref[:]
    per = max(1, VPU_ROUNDS // len(w_refs))
    for i, w in enumerate(w_refs):
        wv = w[:]
        if x.shape[0] != wv.shape[1]:
            x = jnp.concatenate([x, feats[: wv.shape[1] - x.shape[0]]], axis=0)
        x = jnp.dot(wv, x, preferred_element_type=jnp.float32)
        if i != len(w_refs) - 1:
            x = jnp.maximum(x, 0.0).astype(jnp.bfloat16)
        v = _vpu_work(v, per)
    out_ref[:] = jnp.broadcast_to(x[0:1].astype(jnp.float32), out_ref.shape) + v.reshape(1, B)


def build(kernel):
    ws = [np.random.default_rng(i).normal(size=(o, i_)).astype(np.float16) * 0.05
          for i, (o, i_) in enumerate(LAYERS)]
    ws = [jnp.asarray(w, jnp.bfloat16) for w in ws]
    u = jnp.linspace(0.0, 1.0, GRID * B, dtype=jnp.float32)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple([0] * a.ndim),
                                  memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, GRID * B), jnp.float32),
        grid=(GRID,),
        in_specs=[pl.BlockSpec((B,), lambda i: (i,), memory_space=pltpu.VMEM),
                  *[full(w) for w in ws]],
        out_specs=pl.BlockSpec((1, B), lambda i: (0, i), memory_space=pltpu.VMEM),
    )

    @jax.jit
    def run(u):
        def body(i, acc):
            return acc + f(u + i.astype(jnp.float32) * 1e-6, *ws)[0, 0]
        return jax.lax.fori_loop(0, 8, body, 0.0)
    return run, u


def timeit(name, kernel):
    run, u = build(kernel)
    float(run(u))
    t0 = time.monotonic()
    for _ in range(3):
        float(run(u))
    dt = (time.monotonic() - t0) / (3 * 8)
    print(f"{name:12s} {dt*1e3:8.2f} ms/iter")
    return dt


a = timeit("mxu only", k_mxu)
b = timeit("vpu only", k_vpu)
c = timeit("both", k_both)
print(f"serial prediction={1e3*(a+b):.2f}  overlap prediction={1e3*max(a,b):.2f}  measured={c*1e3:.2f}")
