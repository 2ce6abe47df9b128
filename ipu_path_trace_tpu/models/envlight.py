"""Environment lights: constant colour, equirect HDR texture, or NIF MLP.

The reference defers all environment lighting of escaped rays to a
batched lookup after the trace loop (PreProcess -> NIF -> PostProcess,
reference: src/codelets/codelets.cpp:312-385).  That design is also the
TPU-optimal one: the whole escaped-ray batch hits the MXU as one large
matmul.  Dispatch over env-light type is static (by python type), so each
variant jit-specialises.

All variants return RGB.  The NIF variant reverses the network's channel
order exactly as PostProcessEscapedRays does (codelets.cpp:377-378).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp

from ..core.vecmath import Vec3
from .nif import NifParams, nif_apply


class ConstantEnv(NamedTuple):
    """Uniform environment radiance (the minimal end-to-end slice)."""

    colour: Any  # (3,) float32 RGB


class TextureEnv(NamedTuple):
    """Equirectangular HDR texture lookup.

    u indexes rows (theta), v indexes columns (phi) - the same (u, v)
    convention the NIF is trained with (NifModel.cpp:474-490:
    u = row/height, v = col/width).
    """

    texture: Any  # (H, W, 3) float32 RGB
    bilinear: Any = None  # None -> nearest; anything else -> bilinear


class NifEnv(NamedTuple):
    """Neural Image Field environment light (weights as a pytree).

    ``params`` is a NifParams (bf16/f32 chain) or a QuantNifParams
    (models/quant.py int8 chain, --nif-precision int8); every consumer
    dispatches on the pytree type.
    """

    params: NifParams


def _nif_apply_xla(params, u, v):
    """XLA (non-Pallas) NIF evaluation, dispatched on the param type."""
    from .quant import QuantNifParams, nif_apply_quant

    if isinstance(params, QuantNifParams):
        return nif_apply_quant(params, u, v)
    return nif_apply(params, u, v)


def _pallas_available() -> bool:
    """Fused Pallas kernel only lowers on real TPU backends."""
    import jax

    return jax.default_backend() == "tpu"


def eval_env(env, u: jnp.ndarray, v: jnp.ndarray, use_pallas: bool = True) -> Vec3:
    """Evaluate environment radiance at equirect (u, v) in [0, 1].

    ``use_pallas`` opts the NIF variant into the fused VMEM kernel; it is
    ANDed with backend support (the kernel only lowers on TPU).
    """
    if isinstance(env, ConstantEnv):
        c = jnp.asarray(env.colour, jnp.float32)
        ones = jnp.ones_like(u)
        return Vec3(c[0] * ones, c[1] * ones, c[2] * ones)
    if isinstance(env, TextureEnv):
        return _eval_texture(env, u, v)
    if isinstance(env, NifEnv):
        # The network emits its native channel order; reverse it (bgr ->
        # rgb) exactly as PostProcessEscapedRays (codelets.cpp:377-378).
        if use_pallas and _pallas_available():
            # Fused VMEM-resident kernel; channel-major output feeds the
            # Vec3 rows with zero transposes (ops/nif_pallas.py).  The
            # kernel dispatches on the param type (bf16 vs int8 chain).
            from ..ops.nif_pallas import nif_apply_pallas_t

            out_t = nif_apply_pallas_t(env.params, u, v)  # (3, P)
            return Vec3(out_t[2], out_t[1], out_t[0])
        out = _nif_apply_xla(env.params, u, v)  # (P, 3)
        return Vec3(out[:, 2], out[:, 1], out[:, 0])
    raise TypeError(f"Unknown environment light type: {type(env)!r}")


def bake_nif_env(
    env: NifEnv,
    height: int = 2048,
    width: int = 4096,
    use_pallas: bool = True,
    max_batch_size: int = 30 * 1472,
) -> TextureEnv:
    """Decode the NIF once into an equirect texture (TPU-first mode).

    The reference evaluates the MLP inside the render loop because an
    IPU tile cannot hold the decoded HDRI - compressing it into ~1 MB of
    weights IS the point there (README.md:7-12).  A TPU has tens of GB
    of HBM, so this mode decodes once (~8.4M evals, the cost of ~8
    render samples) and serves escaped rays with bilinear lookups.
    Azimuth rotation needs no re-bake - it enters through equirect_uv
    before the lookup, exactly as it enters the NIF's input.

    Measured on v5e, however, the fused in-loop MLP WINS (102 vs 22
    Mpaths/s at 1104x1000): four bilinear gathers per ray from a 100 MB
    HBM texture serialise on the scatter/gather unit, while the MXU
    chews through the 1 MB MLP from VMEM.  The NIF's
    compress-into-compute trade is TPU-optimal too, so fused stays the
    default; baked remains useful for cheap env models on CPU or for
    debugging.

    The grid is laid on the lookup lattice (u_k = k/(h-1)) so
    eval_env(TextureEnv) reproduces eval_env(NifEnv) exactly at lattice
    points and bilinearly in between.  Selected with --nif-mode=baked;
    the default remains the fused in-loop MLP for reference parity.
    """
    import numpy as np
    import jax

    # Serialise by row blocks (the --max-nif-batch-size strategy of
    # PathTracerApp.cpp:146-164, wired from Config.max_nif_batch_size by
    # runtime/app.py): an unbatched 2048x4096 bake would materialise
    # ~(8.4M, hidden) activations per layer on the XLA path.
    rows_per_chunk = max(1, max_batch_size // width)
    cols_v = jnp.tile(jnp.linspace(0.0, 1.0, width), rows_per_chunk)
    out_np = np.empty((height, width, 3), np.float32)
    apply_xla = jax.jit(_nif_apply_xla)
    for r0 in range(0, height, rows_per_chunk):
        r1 = min(r0 + rows_per_chunk, height)
        rows_u = jnp.repeat(
            jnp.arange(r0, r1, dtype=jnp.float32) / (height - 1), width
        )
        v = cols_v[: (r1 - r0) * width]
        if use_pallas and _pallas_available():
            from ..ops.nif_pallas import nif_apply_pallas_t

            out_t = nif_apply_pallas_t(env.params, rows_u, v)  # (3, P)
            chunk = jnp.stack([out_t[2], out_t[1], out_t[0]], axis=-1)
        else:
            chunk = apply_xla(env.params, rows_u, v)[:, ::-1]
        out_np[r0:r1] = np.asarray(chunk).reshape(r1 - r0, width, 3)
    return TextureEnv(texture=jnp.asarray(out_np), bilinear=True)


def _eval_texture(env: TextureEnv, u, v) -> Vec3:
    tex = env.texture
    h, w = tex.shape[0], tex.shape[1]
    rf = jnp.clip(u, 0.0, 1.0) * (h - 1)
    cf = jnp.clip(v, 0.0, 1.0) * (w - 1)
    if env.bilinear is not None:
        r0 = jnp.floor(rf).astype(jnp.int32)
        c0 = jnp.floor(cf).astype(jnp.int32)
        r1 = jnp.minimum(r0 + 1, h - 1)  # clamp at the poles
        c1 = jnp.mod(c0 + 1, w)  # azimuth is periodic: wrap the phi seam
        ar = (rf - r0)[:, None]
        ac = (cf - c0)[:, None]
        t00 = tex[r0, c0]
        t01 = tex[r0, c1]
        t10 = tex[r1, c0]
        t11 = tex[r1, c1]
        rgb = (
            t00 * (1 - ar) * (1 - ac)
            + t01 * (1 - ar) * ac
            + t10 * ar * (1 - ac)
            + t11 * ar * ac
        )
    else:
        r0 = jnp.clip(jnp.round(rf).astype(jnp.int32), 0, h - 1)
        c0 = jnp.clip(jnp.round(cf).astype(jnp.int32), 0, w - 1)
        rgb = tex[r0, c0]
    return Vec3(rgb[:, 0], rgb[:, 1], rgb[:, 2])
