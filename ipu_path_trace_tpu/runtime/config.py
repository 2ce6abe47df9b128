"""Application configuration - the reference's two-tier flag set.

Standard (harness) options mirror src/main.cpp:8-37; tool (render)
options mirror src/PathTracerApp.cpp:794-830, flag for flag with the
same defaults.  TPU-specific additions are listed at the bottom and are
purely additive.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class Config:
    # --- standard options (main.cpp:8-37) ---
    model: bool = False  # simulator: force CPU backend (IPUModel analog)
    ipus: int = 1  # number of chips to shard over (mesh size)
    save_exe: str = ""  # AOT-export compiled programs with this prefix
    load_exe: str = ""  # load previously exported programs
    compile_only: bool = False
    defer_attach: bool = False  # accepted for parity; attach is implicit in JAX
    log_level: str = "info"

    # --- tool options (PathTracerApp.cpp:794-830) ---
    outfile: str = "out.png"
    save_interval: int = 1
    width: int = 256
    height: int = 256
    samples: int = 512
    samples_per_step: int = 512
    interactive_samples: int = 8
    refractive_index: float = 1.5
    roulette_depth: int = 3
    stop_prob: float = 0.3
    aa_noise_scale: float = 0.3
    fov: float = 90.0  # degrees
    exposure: float = 0.0
    gamma: float = 2.2
    env_map_rotation: float = 0.0  # degrees
    seed: int = 1
    aa_noise_type: str = "normal"
    codelet_path: str = "./"  # accepted for parity; no codelets on TPU
    enable_load_balancing: bool = False
    max_path_length: int = 10
    assets: str = ""  # NIF assets dir, or "constant:r,g,b" / "texture:<file>"
    partials_type: str = "half"  # half -> bf16 matmuls, float -> f32
    available_memory_proportion: float = 0.6
    # NIF batch-serialisation cap (PathTracerApp.cpp:146-198,825-827).
    # Bounds the largest single NIF inference batch on the paths that
    # evaluate the net over a full image grid: --nif-mode=baked
    # (models/envlight.bake_nif_env) and models/reconstruct.  The fused
    # render path needs no serialisation - its batch is the kernel grid
    # block, already far below this cap.
    max_nif_batch_size: int = 30 * 1472
    ui_port: int = 0

    # --- TPU-native additions ---
    use_pallas: bool = True  # fused Pallas trace kernel where profitable
    # Worklist layout.  "coherent" sorts records by the primary-hit
    # class of their central ray so kernel blocks become homogeneous and
    # the megastep's dead-block early-out fires block-wise (the SIMD
    # inverse of the reference's MIMD long/short pairing,
    # LoadBalancer.cpp:141-192; measured +3% over raster -
    # runtime/worklist.coherent_order).  "raster" keeps row-major image
    # order.  --enable-load-balancing overrides either with the
    # reference's seed-142 shuffle + per-step re-deal.
    layout: str = "coherent"  # coherent | raster
    mesh_shape: str = ""  # e.g. "4x2" -> pixel x sample mesh axes; "" = 1D pixels
    cache_dir: str = ""  # persistent XLA compilation cache directory
    rng_impl: str = "auto"  # auto | threefry2x32 | rbg | unsafe_rbg
    # fused: MLP evaluated in-loop (reference semantics); baked: decode the
    # NIF once to an equirect texture and serve lookups (TPU-first; HBM is
    # plentiful, unlike IPU SRAM where compressing the HDRI was the point).
    nif_mode: str = "fused"  # fused | baked
    # NIF chain arithmetic: "auto" follows --partials-type (bf16/f32);
    # "int8" runs the quantised chain (models/quant.py) on the MXU's
    # double-rate int8 mode - 1.6x measured, gated on on-class PSNR
    # (docs/QUANT.json).  QAT'd assets ship a quant_amax.json sidecar
    # with the activation grids their fine-tune trained against.
    nif_precision: str = "auto"  # auto | int8
    profile_dir: str = ""  # XLA profiler trace dir (PVTI analog); "" = off
    device_timing: bool = False  # log the trace/NIF device-time split
    # Dead-block env-skip: elide the NIF matmul chain for kernel blocks
    # whose escape weights are all zero (exact identity).  Pays 7.55x on
    # fully enclosed scenes, ~1.5% overhead on open ones
    # (docs/ENVSKIP.json).  "auto" (default) measures the dead-block
    # fraction at build time with a cheap CPU-backend trace probe and
    # turns the skip on only when it clears the measured guard cost
    # (runtime/app.PathTracerApp._resolve_env_skip); "on"/"off" force.
    # Bools are accepted for backwards compatibility (True="on").
    env_skip: str | bool = "auto"
    # Thin-lens depth of field; aperture 0 = the reference's pinhole:
    aperture: float = 0.0
    focal_distance: float = 1.0
    # Keep the worklist device-resident between steps and download it
    # only at save-interval boundaries.  The reference round-trips the
    # whole 20 B/pixel trace buffer every step because the host owns
    # accumulation (PathTracerApp.cpp:425-475); on TPU the film can stay
    # on device (cost quantified in scripts/host_roundtrip_bench.py: on
    # a direct PCIe host the round-trip is ~8% of an 8 spp interactive
    # step; through the dev tunnel it dominates every step size).
    # Incompatible with dynamic load
    # balancing (which must inspect per-step path lengths on the host).
    # With a remote UI attached, per-step previews are tone-mapped on
    # device and only H*W*3 LDR bytes cross to the host (_device_preview);
    # the full worklist still moves only at save-interval.
    device_film: bool = False
    # JSON scene description (core/scenefile.py); "" = the reference's
    # hard-coded default scene (codelets.cpp:111-144).
    scene: str = ""
    # Mid-render checkpoint/resume (runtime/checkpoint.py): --checkpoint
    # writes the progressive state (.npz) at every save-interval and at
    # exit; --resume continues from one bitwise-identically.  The
    # reference can only restart from scratch (PathTracerApp.cpp:652-686).
    checkpoint: str = ""
    resume: str = ""
    # Restart-with-identical-args ergonomics (k8s/preemption pattern):
    # resume from --checkpoint when the file exists, start fresh when it
    # does not.  One command line serves both the first launch and every
    # restart after a kill.
    auto_resume: bool = False
    # Structured observability: append one JSON line per completed step
    # ({step, seconds, samples_per_sec, ...}) plus a final summary line.
    # The reference only logs free text (PathTracerApp.cpp:763-776).
    metrics_file: str = ""
    # Adaptive per-block sampling (render/adaptive.py): allocate each
    # step's sample budget across kernel blocks by measured luminance
    # variance (Neyman allocation) instead of uniformly.  Unbiased (the
    # film normalises per record) and deterministic (budgets derive from
    # accumulated state).  Needs --device-film (int32 counts + on-device
    # controller) and the fused NIF megastep.  The reference always
    # samples uniformly (PathTracerApp.cpp:466-468).
    # Debug-visualisation save mode (film/debugview.py): replace the
    # SAVED image with a deterministic diagnostic channel (normal,
    # albedo, depth, path-length heat, escape-uv) rendered through the
    # production camera/intersector.  The accumulator is untouched.
    # Analog of the reference's DEBUG contribution case
    # (codelets.cpp:283-285) and its UV debug overwrite (:345).
    debug_view: str = ""  # "" | normal | albedo | depth | path-length | escape-uv
    adaptive: bool = False
    adaptive_min: int = 8  # per-block budget floor (samples/step)
    adaptive_max_factor: float = 16.0  # budget cap = factor * samples-per-step
    # Sample-stream generator (render/qmc.py): "prng" = independent
    # counter-based uniforms (the reference's poprand-pool analog);
    # "sobol" = hash-based Owen-scrambled Sobol on the first
    # --sobol-dims path dimensions (prng beyond) - same unbiased
    # estimator, faster RMSE convergence.  Per-lane sequence indices
    # ride the worklist sampleCount, so sobol composes with
    # progressive steps, checkpoints, meshes and --adaptive.
    sampler: str = "prng"  # prng | sobol
    sobol_dims: int = 12  # camera (4) + whole bounces (4 each)
    # À-trous wavelet denoiser (film/denoise.py): filter SAVED images
    # with primary-hit guide buffers (albedo demodulation, normal +
    # disparity edge stopping).  A pure post-process on the save path -
    # the accumulator is untouched, so progressive refinement stays
    # unbiased and later saves start from the true Monte-Carlo state.
    # The reference saves the raw film only (AccumulatedImage.cpp:48-56).
    denoise: bool = False
    denoise_iters: int = 4  # à-trous dilation passes (filter radius 2^n)
    # Log-luminance edge-stop sigma: lower preserves more detail, higher
    # smooths harder (measured sweet spots: ~0.5 near-converged frames,
    # ~2 very noisy previews - docs/DENOISE.json):
    denoise_sigma: float = 1.0
    # Firefly suppressor inside --denoise: luminance clamped to k x the
    # 3x3 neighbourhood median (demodulated domain) before the wavelet
    # pass; 0 disables.  Point reflections of extreme HDR emitters are
    # single-pixel outliers the edge-stop otherwise keeps as 'detail'.
    denoise_clamp: float = 10.0
    # (knee of the measured efficiency curve: 2x->2.0x, 4x->3.2x, 16x->5.0x,
    #  32x->6.1x, 64x->6.5x sample efficiency; docs/ADAPTIVE.json knob_sweep)
    # Deterministic-replay / test knob (no CLI flag): > 0 runs the
    # production Pallas kernels in host-noise mode with this static
    # per-step sample count (StaticConfig.pallas_interpret) - the real
    # kernel on TPU, the emulated kernel elsewhere.  Lets app-level
    # tests drive Pallas-only paths (e.g. --adaptive) on the CPU mesh.
    # Callers must keep samples_per_step equal to it.
    pallas_interpret: int = 0

    def validate(self) -> None:
        if isinstance(self.env_skip, bool):  # pre-auto callers
            self.env_skip = "on" if self.env_skip else "off"
        if self.env_skip not in ("auto", "on", "off"):
            raise ValueError(f"unknown --env-skip '{self.env_skip}' "
                             "(choices: auto, on, off)")
        if self.save_exe and self.load_exe:
            raise ValueError("You can not set both save-exe and load-exe.")
        if self.device_film and self.enable_load_balancing:
            raise ValueError(
                "--device-film is incompatible with --enable-load-balancing "
                "(load balancing needs per-step path lengths on the host)"
            )
        if not self.assets:
            raise ValueError("the option '--assets' is required but missing")
        if self.samples_per_step < 1 or self.samples < 1:
            raise ValueError("samples and samples-per-step must be >= 1")
        if self.samples_per_step > 0xFFFF and not self.device_film:
            # The step-wise host pipeline rides the 20-byte wire record,
            # whose u16 sampleCount clips at 65535 and would silently
            # brighten the image; the device-film path keeps int32 counts.
            raise ValueError(
                "samples-per-step > 65535 needs --device-film (the u16 "
                "wire sampleCount would clip)")
        if self.interactive_samples > 0xFFFF and not self.device_film:
            # Interactive steps ride the same wire record (the UI wire
            # path enforces this too, app._process_user_input).
            raise ValueError(
                "interactive-samples > 65535 needs --device-film (the "
                "u16 wire sampleCount would clip)")
        if self.save_interval < 1:
            raise ValueError("save-interval must be >= 1")
        if self.layout not in ("coherent", "raster"):
            raise ValueError(f"unknown --layout '{self.layout}' "
                             "(choices: coherent, raster)")
        if self.sampler not in ("prng", "sobol"):
            raise ValueError(f"unknown --sampler '{self.sampler}' "
                             "(choices: prng, sobol)")
        if self.sampler == "sobol" and self.sobol_dims < 4:
            raise ValueError("--sobol-dims must be >= 4 (the camera dims)")
        if self.denoise_iters < 1 or self.denoise_iters > 8:
            raise ValueError("--denoise-iters must be in [1, 8] "
                             "(filter radius grows as 2^n)")
        if self.denoise_sigma <= 0.0:
            raise ValueError("--denoise-sigma must be > 0")
        if self.denoise_clamp < 0.0:
            raise ValueError("--denoise-clamp must be >= 0 (0 disables)")
        if self.adaptive:
            if not self.device_film:
                raise ValueError(
                    "--adaptive needs --device-film (int32 per-record "
                    "counts and the on-device budget controller)")
            if not self.use_pallas:
                raise ValueError("--adaptive needs the fused Pallas "
                                 "megastep (--use-pallas)")
            if self.nif_mode != "fused":
                raise ValueError("--adaptive needs --nif-mode fused "
                                 "(budgets live in the fused megastep)")
            if self.adaptive_min < 1:
                raise ValueError("--adaptive-min must be >= 1")
            if self.adaptive_max_factor < 1.0:
                raise ValueError("--adaptive-max-factor must be >= 1")
            if self.samples_per_step < self.adaptive_min or (
                    self.ui_port and self.interactive_samples < self.adaptive_min):
                raise ValueError(
                    "samples-per-step (and interactive-samples with a UI) "
                    "must be >= --adaptive-min")
        if self.pallas_interpret > 0:
            # The knob OVERRIDES the dynamic per-step sample count with a
            # static one; a mismatch would silently render the wrong
            # total (render/params.py StaticConfig.pallas_interpret).
            if self.samples_per_step != self.pallas_interpret or (
                    self.ui_port and
                    self.interactive_samples != self.pallas_interpret):
                raise ValueError(
                    "pallas_interpret (host-noise replay) must equal "
                    "samples-per-step (and interactive-samples with a UI)")
        if self.auto_resume and not self.checkpoint:
            raise ValueError("--auto-resume needs --checkpoint (the file "
                             "it resumes from and keeps writing)")
        if self.auto_resume and self.resume:
            raise ValueError("use either --resume or --auto-resume, not both")

    def rounded_samples_per_pixel(self) -> int:
        """Round spp up to a multiple of samples-per-step
        (roundSamplesPerPixel, PathTracerApp.cpp:19-27)."""
        spp = self.samples
        if spp % self.samples_per_step:
            spp += self.samples_per_step - (spp % self.samples_per_step)
        return spp
