"""Parity of the fully fused render-step megakernel (trace + NIF + sample
loop in one Pallas kernel) against the XLA twin.

Host-noise mode + interpret mode: both sides consume identical noise, so
the trace part matches to float associativity and the NIF part to the
kernel's documented feature-encode budget (see test_nif_pallas).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ipu_path_trace_tpu.core.envmap import equirect_uv
from ipu_path_trace_tpu.core.records import make_worklist
from ipu_path_trace_tpu.core.scene import default_scene
from ipu_path_trace_tpu.models.nif import make_params, make_synthetic_nif, nif_apply
from ipu_path_trace_tpu.ops.megastep_pallas import render_megastep_pallas
from ipu_path_trace_tpu.render.params import RenderSettings, StaticConfig
from ipu_path_trace_tpu.render.wavefront import trace_sample_with_uniforms

W = H = 24  # 576 rays; not a multiple of the block size (padding path)
BLOCK = 256
SAMPLES = 3
MAXLEN = 5


def _setup(hidden=64, num_hidden=3):
    scene = default_scene()
    cfg = StaticConfig(width=W, height=H, max_path_length=MAXLEN)
    settings = RenderSettings.make(samples_per_step=SAMPLES)
    weights, meta = make_synthetic_nif(
        key=5, hidden=hidden, num_hidden=num_hidden, skip_layer=1
    )
    params = make_params(weights, meta, jnp.bfloat16)
    work = make_worklist(W, H)
    cols = jnp.asarray(work["u"], jnp.float32)
    rows = jnp.asarray(work["v"], jnp.float32)
    rng = np.random.default_rng(21)
    p = cols.shape[0]
    noise = rng.uniform(0.0, 1.0, size=(SAMPLES, 4 + 4 * MAXLEN, p)).astype(np.float32)
    noise[:, 0:2] = rng.normal(size=(SAMPLES, 2, p))  # AA jitter is normal
    return scene, cfg, settings, params, cols, rows, noise


def _xla_twin(scene, cfg, settings, params, cols, rows, noise):
    """Sum of per-sample radiance (env applied) + path lengths."""
    p = cols.shape[0]
    rad = np.zeros((3, p), np.float32)
    plen = np.zeros(p, np.int64)
    for s in range(noise.shape[0]):
        st = trace_sample_with_uniforms(
            scene, settings, cfg, cols, rows,
            jnp.asarray(noise[s, 0:2]), jnp.asarray(noise[s, 2:4]),
            jnp.asarray(noise[s, 4:].reshape(MAXLEN, 4, p)),
        )
        u, v = equirect_uv(st.esc_dir, settings.azimuth)
        u = jnp.where(st.escaped, u, 0.0)
        v = jnp.where(st.escaped, v, 0.0)
        out = nif_apply(params, u, v)  # (P, 3) network (bgr) order
        rad[0] += np.asarray(st.radiance.x + st.esc_w.x * out[:, 2])
        rad[1] += np.asarray(st.radiance.y + st.esc_w.y * out[:, 1])
        rad[2] += np.asarray(st.radiance.z + st.esc_w.z * out[:, 0])
        plen += np.asarray(st.path_len, np.int64)
    return rad, plen


def test_megastep_matches_xla_chain():
    scene, cfg, settings, params, cols, rows, noise = _setup()
    ref_rad, ref_plen = _xla_twin(scene, cfg, settings, params, cols, rows, noise)

    out = render_megastep_pallas(
        scene, settings, params, cols, rows, noise=jnp.asarray(noise),
        width=W, height=H, max_path_length=MAXLEN,
        aa_noise_type=cfg.aa_noise_type, block_size=BLOCK, interpret=True,
    )
    got = np.stack(
        [np.asarray(out.radiance.x), np.asarray(out.radiance.y), np.asarray(out.radiance.z)]
    )
    # Borderline intersections (tangent rays) may flip between two
    # independently compiled implementations: fp contraction differs, a
    # hit becomes a miss, and that lane's whole path diverges.  Measured
    # rate: ~1 lane in 1728.  Bound the flips, then require the NIF
    # budget (test_nif_pallas) on the non-flipped lanes.
    flipped = np.asarray(out.path_len) != ref_plen
    assert flipped.mean() < 5e-3, f"{flipped.sum()} flipped lanes"
    ok = ~flipped
    scale = np.abs(ref_rad).max()
    rel = (np.abs(got - ref_rad) / (np.abs(ref_rad) + 1e-2 * scale))[:, ok]
    assert np.median(rel) < 5e-3
    assert rel.max() < 8e-2


def test_megastep_mixed_width_nif():
    """Mixed per-layer NIF widths through the fused production kernel:
    the weight BlockSpecs carry a different shape per layer and the
    skip-concat re-detection must pick layer 1 (the only mismatch)."""
    scene, cfg, settings, params, cols, rows, noise = _setup(
        hidden=[64, 32, 48], num_hidden=3
    )
    ref_rad, ref_plen = _xla_twin(scene, cfg, settings, params, cols, rows, noise)
    out = render_megastep_pallas(
        scene, settings, params, cols, rows, noise=jnp.asarray(noise),
        width=W, height=H, max_path_length=MAXLEN,
        aa_noise_type=cfg.aa_noise_type, block_size=BLOCK, interpret=True,
    )
    got = np.stack(
        [np.asarray(out.radiance.x), np.asarray(out.radiance.y), np.asarray(out.radiance.z)]
    )
    flipped = np.asarray(out.path_len) != ref_plen
    assert flipped.mean() < 5e-3, f"{flipped.sum()} flipped lanes"
    ok = ~flipped
    scale = np.abs(ref_rad).max()
    rel = (np.abs(got - ref_rad) / (np.abs(ref_rad) + 1e-2 * scale))[:, ok]
    assert np.median(rel) < 5e-3
    assert rel.max() < 8e-2


def test_megastep_env_skip_exact():
    """The dead-block env-skip (--env-skip) semantics: with identical
    noise, env_skip on/off must agree - on the open default scene the
    guard may only perturb the guarded NIF chain by float reassociation
    (lax.cond changes fusion; <= 1 ULP observed, bounded here at 1e-6),
    while on a fully enclosed scene (camera inside a giant diffuse
    shell: every block is all-dead, the skip branch actually fires) the
    elided chain must be BIT-EXACT - zero weights times finite NIF
    output is exactly the skip branch's zeros."""
    from ipu_path_trace_tpu.core.scenefile import scene_from_dict

    enclosed = scene_from_dict({"objects": [
        {"type": "sphere", "center": [0.0, 0.0, 0.0], "radius": 50.0,
         "colour": [0.5, 0.5, 0.5], "material": "diffuse",
         "emission": [0.2, 0.2, 0.2]},
        {"type": "sphere", "center": [0.0, -0.5, -3.0], "radius": 0.5,
         "colour": [0.8, 0.3, 0.3], "material": "specular"},
    ]})
    base = _setup()
    for scene, rtol, atol in ((base[0], 1e-6, 1e-6), (enclosed, 0.0, 0.0)):
        _, cfg, settings, params, cols, rows, noise = base
        outs = [
            render_megastep_pallas(
                scene, settings, params, cols, rows, noise=jnp.asarray(noise),
                width=W, height=H, max_path_length=MAXLEN,
                aa_noise_type=cfg.aa_noise_type, block_size=BLOCK,
                interpret=True, env_skip=skip,
            )
            for skip in (False, True)
        ]
        np.testing.assert_array_equal(
            np.asarray(outs[0].path_len), np.asarray(outs[1].path_len))
        for ch in ("x", "y", "z"):
            np.testing.assert_allclose(
                np.asarray(getattr(outs[0].radiance, ch)),
                np.asarray(getattr(outs[1].radiance, ch)),
                rtol=rtol, atol=atol)
    # The enclosed scene really exercises the skip: nothing escapes.
    st = trace_sample_with_uniforms(
        enclosed, base[2], base[1], base[4], base[5],
        jnp.asarray(base[6][0, 0:2]), jnp.asarray(base[6][0, 2:4]),
        jnp.asarray(base[6][0, 4:].reshape(MAXLEN, 4, base[4].shape[0])),
    )
    assert float((st.esc_w.x + st.esc_w.y + st.esc_w.z).sum()) == 0.0


def test_megastep_dof_parity():
    """Thin-lens DoF through the fused step replays the XLA chain (the
    lens uniforms are noise rows 2:4 in both)."""
    scene, cfg, settings, params, cols, rows, noise = _setup()
    settings = settings._replace(
        aperture=jnp.float32(0.08), focal_distance=jnp.float32(3.2)
    )
    ref_rad, ref_plen = _xla_twin(scene, cfg, settings, params, cols, rows, noise)
    out = render_megastep_pallas(
        scene, settings, params, cols, rows, noise=jnp.asarray(noise),
        width=W, height=H, max_path_length=MAXLEN,
        aa_noise_type=cfg.aa_noise_type, block_size=BLOCK, interpret=True,
    )
    got = np.stack(
        [np.asarray(out.radiance.x), np.asarray(out.radiance.y), np.asarray(out.radiance.z)]
    )
    flipped = np.asarray(out.path_len) != ref_plen
    assert flipped.mean() < 5e-3, f"{flipped.sum()} flipped lanes"
    ok = ~flipped
    scale = np.abs(ref_rad).max()
    rel = (np.abs(got - ref_rad) / (np.abs(ref_rad) + 1e-2 * scale))[:, ok]
    assert np.median(rel) < 5e-3
    assert rel.max() < 8e-2


def test_megastep_zero_samples():
    """samples_per_step staying dynamic means 0 must work (and yield 0)."""
    scene, cfg, settings, params, cols, rows, noise = _setup()
    out = render_megastep_pallas(
        scene, settings, params, cols, rows,
        noise=jnp.asarray(noise[:0]),
        width=W, height=H, max_path_length=MAXLEN,
        aa_noise_type=cfg.aa_noise_type, block_size=BLOCK, interpret=True,
    )
    assert float(jnp.abs(out.radiance.x).max()) == 0.0
    assert int(jnp.abs(out.path_len).max()) == 0


def test_render_step_host_noise_forwards_stub():
    """Regression: the host-noise branch of render_step_impl must forward
    cfg.megastep_stub to the kernel (the --device-timing in-kernel split
    times cfg._replace(megastep_stub=...) through this exact path)."""
    from ipu_path_trace_tpu.core.records import to_device_batch
    from ipu_path_trace_tpu.models.envlight import NifEnv
    from ipu_path_trace_tpu.render.wavefront import make_base_key, render_step_impl

    scene = default_scene()
    weights, meta = make_synthetic_nif(key=5, hidden=64, num_hidden=3)
    env = NifEnv(params=make_params(weights, meta, jnp.bfloat16))
    work = to_device_batch(make_worklist(W, H))
    key = make_base_key(3)

    def run(stub):
        cfg = StaticConfig(
            width=W, height=H, max_path_length=MAXLEN,
            pallas_interpret=2, megastep_stub=stub,
        )
        out = render_step_impl(
            scene, RenderSettings.make(samples_per_step=2), cfg, work, key, env
        )
        return np.asarray(out.r)

    full = run("")
    skeleton = run("both")
    assert full.any()
    # A forwarded 'both' stub zeroes the trace + NIF work; if the stub
    # were dropped the two runs would be identical:
    assert not np.array_equal(full, skeleton)


def test_devtime_host_noise_sample_count():
    """measure_phases must time pallas_interpret samples in host-noise
    mode (samples_per_step is ignored by that path)."""
    from ipu_path_trace_tpu.core.records import to_device_batch
    from ipu_path_trace_tpu.models.envlight import NifEnv
    from ipu_path_trace_tpu.render.wavefront import make_base_key
    from ipu_path_trace_tpu.utils.devtime import measure_phases

    scene = default_scene()
    weights, meta = make_synthetic_nif(key=5, hidden=64, num_hidden=3)
    env = NifEnv(params=make_params(weights, meta, jnp.bfloat16))
    cfg = StaticConfig(width=W, height=H, max_path_length=MAXLEN,
                       pallas_interpret=2)
    settings = RenderSettings.make(samples_per_step=2)
    work = to_device_batch(make_worklist(W, H))
    split = measure_phases(scene, settings, cfg, work, make_base_key(1), env,
                           loop=300, reps=1)
    assert split["step_ms"] > 0 and np.isfinite(split["mpaths_per_sec"])
    # Interpret-mode kernels are ~1000x slower than XLA; if the division
    # used loop=300 instead of the 2 actually rendered, step_ms would be
    # implausibly tiny (< 150x smaller). Bound loosely:
    assert split["step_ms"] > 0.05
