"""Render parameters, split by compilation behaviour.

StaticConfig changes recompile the step (shapes / loop bounds / kernel
choice); RenderSettings are traced scalars streamed to the device each
step, the analog of the reference's runtime-tunable StreamableTensors
(reference: src/PathTracerApp.hpp:107-115 - seed, aa-scale, fov, azimuth,
sample limit).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class StaticConfig(NamedTuple):
    """Compile-time render configuration."""

    width: int = 256
    height: int = 256
    max_path_length: int = 10  # --max-path-length
    aa_noise_type: str = "normal"  # --aa-noise-type
    use_pallas: bool = True  # fused Pallas kernels (NIF env light; TPU only)
    # One-kernel-per-step fusion (sample loop + trace + NIF with VPU/MXU
    # overlap, ops/megastep_pallas.py); off = per-sample kernel pair:
    use_fused_step: bool = True
    # Deterministic-replay override: > 0 runs the PRODUCTION Pallas
    # kernels in host-noise mode with the value giving the STATIC
    # per-step sample count (it overrides the dynamic
    # settings.samples_per_step; callers should keep the two equal).
    # The noise is derived from the step key with the exact fold_in
    # schedule of the XLA wavefront path, so renders replay the same
    # streams the tests' oracles do - on ANY backend: the real kernel
    # on TPU, the emulated (interpret) kernel elsewhere, including
    # inside shard_map on the virtual CPU mesh (the IPUModel analog for
    # the kernel layer, reference: src/ipu_utils.hpp:78-86).
    pallas_interpret: int = 0
    # Measurement-only knob for --device-timing's in-kernel phase split
    # (utils/devtime.py): '' = real kernel; 'nif' stubs the NIF matmuls,
    # 'trace' stubs the bounce loop, 'both' leaves the skeleton.  The
    # cycle-counter analog of src/PathTracerApp.cpp:438-462.
    megastep_stub: str = ""
    # Adaptive per-block sampling bounds (render/adaptive.py; only read
    # by the adaptive step).  Budgets are clipped to
    # [adaptive_min, adaptive_max_factor * samples_per_step]:
    adaptive_min: int = 8
    adaptive_max_factor: float = 16.0
    # Dead-block env-skip: elide the whole NIF matmul chain for kernel
    # blocks whose escape weights are all zero (exact identity; the MXU
    # analog of the trace's dead-block early-out).  Measured 7.55x on a
    # fully enclosed scene but ~1.5% overhead on open scenes where no
    # block ever dies (docs/ENVSKIP.json) - so opt-in per scene
    # (--env-skip for interiors).
    env_skip: bool = False
    # Sample-stream generator: "prng" = independent counter-based
    # uniforms (threefry on host, hardware PRNG in the kernels - the
    # analog of the reference's poprand pools, PathTracerApp.cpp:266-299);
    # "sobol" = hash-based Owen-scrambled Sobol (render/qmc.py) on the
    # first ``sobol_dims`` path dimensions with prng padding beyond.
    sampler: str = "prng"
    # How many leading path dimensions ride the Sobol sequence in sobol
    # mode: a multiple of 4 covering the camera dims (AA x2, lens x2)
    # plus whole bounces (4 each).  12 = camera + bounces 0-1, where
    # nearly all of the integrand's variance lives at the default scene
    # (94% of paths escape by bounce 2).  Clipped to 4 + 4*max_path_length.
    sobol_dims: int = 12


class RenderSettings(NamedTuple):
    """Runtime-tunable scalars (traced; no recompile on change).

    samples_per_step is deliberately dynamic - the reference streams the
    on-device sample limit at runtime too (deviceSampleLimit,
    PathTracerApp.cpp:353-355,466-468), so switching between interactive
    and full sampling never recompiles.
    """

    fov: jnp.ndarray  # horizontal field of view, radians
    aa_scale: jnp.ndarray  # anti-alias jitter scale, pixels
    azimuth: jnp.ndarray  # env-map rotation, radians
    refractive_index: jnp.ndarray  # --refractive-index
    stop_prob: jnp.ndarray  # russian roulette stop probability
    roulette_depth: jnp.ndarray  # bounces before roulette starts (int32)
    samples_per_step: jnp.ndarray  # on-device sample loop count (int32)
    # Thin-lens depth of field (TPU-native addition; aperture 0 = the
    # reference's pinhole camera).  Runtime-tunable like the rest:
    aperture: jnp.ndarray  # lens radius in scene units
    focal_distance: jnp.ndarray  # focus-plane distance along -z
    # Render-wide Owen-scramble key for --sampler sobol (render/qmc.py).
    # Derived from the CLI seed; MUST stay constant across steps so each
    # pixel walks one continuous scrambled-Sobol sequence.  Unused (but
    # still carried - settings are a fixed pytree) in prng mode.
    sobol_key: jnp.ndarray = 0  # uint32 scalar (int 0 default, weak-typed)

    @staticmethod
    def make(
        fov_degrees: float = 90.0,
        aa_scale: float = 0.3,
        env_rotation_degrees: float = 0.0,
        refractive_index: float = 1.5,
        stop_prob: float = 0.3,
        roulette_depth: int = 3,
        samples_per_step: int = 512,
        aperture: float = 0.0,
        focal_distance: float = 1.0,
        seed: int = 1,
    ) -> "RenderSettings":
        import numpy as np

        return RenderSettings(
            fov=jnp.float32(np.deg2rad(fov_degrees)),
            aa_scale=jnp.float32(aa_scale),
            azimuth=jnp.float32(np.deg2rad(env_rotation_degrees)),
            refractive_index=jnp.float32(refractive_index),
            stop_prob=jnp.float32(stop_prob),
            roulette_depth=jnp.int32(roulette_depth),
            samples_per_step=jnp.int32(samples_per_step),
            aperture=jnp.float32(aperture),
            focal_distance=jnp.float32(focal_distance),
            sobol_key=np.uint32(seed & 0xFFFFFFFF),
        )
