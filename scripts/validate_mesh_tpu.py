"""On-TPU validation of the production multichip code path.

Builds a 1x1 jax.sharding.Mesh on the single attached TPU chip and runs
the FUSED Pallas megastep INSIDE shard_map (the exact program a real pod
executes: pallas_call lowered under the mesh with psum around its
outputs - parallel/mesh.sharded_render_step -> render/wavefront.py ->
ops/megastep_pallas.py), then asserts the result EQUALS the mesh-None
single-chip render of the same streams.

The sharded step folds the step key with both mesh axis indices
(parallel/mesh.py local_step), so the single-chip comparison applies the
same fold_in(0)/fold_in(0) before rendering - after that the seeds, the
per-block PRNG seeding, and the grid are identical and the outputs must
match bitwise (the 1-element psum is an identity).

Run on a machine with an attached TPU:  python scripts/validate_mesh_tpu.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main() -> int:
    from ipu_path_trace_tpu.core.records import make_worklist, to_device_batch
    from ipu_path_trace_tpu.core.scene import default_scene
    from ipu_path_trace_tpu.models.envlight import NifEnv
    from ipu_path_trace_tpu.models.nif import make_params, make_synthetic_nif
    from ipu_path_trace_tpu.parallel.mesh import (
        make_mesh,
        replicate,
        shard_work,
        sharded_render_step,
    )
    from ipu_path_trace_tpu.render.params import RenderSettings, StaticConfig
    from ipu_path_trace_tpu.render.wavefront import make_base_key, render_step

    width = height = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    dev = jax.devices()[0]
    print(f"device: {dev}  {width}x{height} @ {spp} spp")
    if dev.platform != "tpu":
        print("WARNING: not a TPU - this validates the hardware lowering; "
              "run it with the TPU attached.")

    scene = default_scene()
    weights, meta = make_synthetic_nif(key=0)
    env = NifEnv(params=make_params(weights, meta, jnp.bfloat16))
    cfg = StaticConfig(width=width, height=height)
    settings = RenderSettings.make(samples_per_step=spp)
    work = to_device_batch(make_worklist(width, height))
    key = make_base_key(7)

    mesh = make_mesh(1, "1x1")
    out_mesh = sharded_render_step(
        replicate(scene, mesh), settings, cfg, shard_work(work, mesh),
        key, replicate(env, mesh), mesh,
    )
    jax.block_until_ready(out_mesh)
    print(f"shard_map∘pallas_call compiled and ran on {dev.platform}: "
          f"sum_r={float(jnp.sum(out_mesh.r)):.6f}")

    # Single-chip replay of the same streams (mesh folds both axis ids):
    key2 = jax.random.fold_in(jax.random.fold_in(key, 0), 0)
    out_single = render_step(scene, settings, cfg, work, key2, env)
    jax.block_until_ready(out_single)

    ok = True
    for f in out_single._fields:
        a = np.asarray(getattr(out_mesh, f))
        b = np.asarray(getattr(out_single, f))
        eq = np.array_equal(a, b)
        ok &= eq
        print(f"  {f:13s}: {'EXACT' if eq else 'MISMATCH'}"
              + ("" if eq else f"  max|d|={np.abs(a - b).max():.3e}"))

    # --sampler sobol through the same shard_map'd megastep (round-3
    # feature; the sharded step offsets sobol sequence indices by the
    # samples-axis position, an identity on a 1x1 mesh):
    cfg_s = cfg._replace(sampler="sobol", sobol_dims=12)
    out_mesh_s = sharded_render_step(
        replicate(scene, mesh), settings, cfg_s, shard_work(work, mesh),
        key, replicate(env, mesh), mesh,
    )
    out_single_s = render_step(scene, settings, cfg_s, work, key2, env)
    for f in out_single_s._fields:
        a = np.asarray(getattr(out_mesh_s, f))
        b = np.asarray(getattr(out_single_s, f))
        eq = np.array_equal(a, b)
        ok &= eq
        print(f"  sobol {f:13s}: {'EXACT' if eq else 'MISMATCH'}"
              + ("" if eq else f"  max|d|={np.abs(a - b).max():.3e}"))

    # --adaptive through the mesh (round-3 feature): two steps so the
    # second allocates from real moments; per-shard on-device controller,
    # lum2 psum, budget-BOUNDED megastep loop on hardware:
    from ipu_path_trace_tpu.parallel.mesh import (
        shard_array, sharded_adaptive_render_step,
    )
    from ipu_path_trace_tpu.render.adaptive import adaptive_render_step

    cfg_a = cfg._replace(adaptive_min=2, adaptive_max_factor=4.0)
    lum2 = jnp.zeros(work.u.shape[0], jnp.float32)
    out_mesh_a, l2_mesh = shard_work(work, mesh), shard_array(lum2, mesh)
    out_single_a, l2_single = work, lum2
    for step in (1, 2):
        k = jax.random.fold_in(key, step)
        out_mesh_a, l2_mesh = sharded_adaptive_render_step(
            replicate(scene, mesh), settings, cfg_a, out_mesh_a, l2_mesh,
            k, replicate(env, mesh), mesh,
        )
        k2 = jax.random.fold_in(jax.random.fold_in(k, 0), 0)
        out_single_a, l2_single = adaptive_render_step(
            scene, settings, cfg_a, out_single_a, l2_single, k2, env)
    for f in out_single_a._fields:
        a = np.asarray(getattr(out_mesh_a, f))
        b = np.asarray(getattr(out_single_a, f))
        eq = np.array_equal(a, b)
        ok &= eq
        print(f"  adaptive {f:13s}: {'EXACT' if eq else 'MISMATCH'}"
              + ("" if eq else f"  max|d|={np.abs(a - b).max():.3e}"))
    eq = np.array_equal(np.asarray(l2_mesh), np.asarray(l2_single))
    ok &= eq
    print(f"  adaptive lum2        : {'EXACT' if eq else 'MISMATCH'}")
    counts = np.asarray(out_mesh_a.sample_count)
    adapted = counts.min() != counts.max()
    ok &= adapted
    print(f"  adaptive budgets varied across blocks: {adapted}")

    print("PASS" if ok else "FAIL (sharded != single-chip replay)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
