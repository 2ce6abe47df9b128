"""Adaptive per-block sampling (render/adaptive.py, a TPU-native
extension beyond the reference's uniform sampler).

Exactness strategy: host-noise interpret mode makes the fused megastep
deterministic, so a budgeted run must decompose EXACTLY into independent
per-block runs with the noise sliced to each block's budget - budgets
only bound the sample loop, they change no sample's arithmetic.  The
second-moment (lum^2) accumulator is checked against per-sample
single-sample runs, and the controller against hand-computed
allocations.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ipu_path_trace_tpu.core.records import make_worklist, to_device_batch
from ipu_path_trace_tpu.core.scene import default_scene
from ipu_path_trace_tpu.models.envlight import NifEnv
from ipu_path_trace_tpu.models.nif import make_params, make_synthetic_nif
from ipu_path_trace_tpu.ops.megastep_pallas import (
    LUM_B,
    LUM_G,
    LUM_R,
    render_megastep_pallas,
)
from ipu_path_trace_tpu.render.adaptive import (
    adaptive_render_step,
    compute_budgets,
)
from ipu_path_trace_tpu.render.params import RenderSettings, StaticConfig
from ipu_path_trace_tpu.render.wavefront import make_base_key

W, H = 32, 16  # 512 records = exactly 2 interpret-mode blocks of 256
BLOCK = 256
MAXLEN = 3
S_MAX = 3


def _setup():
    scene = default_scene()
    cfg = StaticConfig(width=W, height=H, max_path_length=MAXLEN)
    settings = RenderSettings.make(samples_per_step=S_MAX)
    weights, meta = make_synthetic_nif(key=5, hidden=32, num_hidden=2,
                                       skip_layer=1)
    params = make_params(weights, meta, jnp.bfloat16)
    work = make_worklist(W, H)
    cols = jnp.asarray(work["u"], jnp.float32)
    rows = jnp.asarray(work["v"], jnp.float32)
    rng = np.random.default_rng(33)
    p = cols.shape[0]
    noise = rng.uniform(0.0, 1.0, size=(S_MAX, 4 + 4 * MAXLEN, p)).astype(np.float32)
    noise[:, 0:2] = rng.normal(size=(S_MAX, 2, p))
    return scene, cfg, settings, params, cols, rows, noise


def _run(scene, settings, params, cols, rows, noise, **kw):
    return render_megastep_pallas(
        scene, settings, params, cols, rows, noise=jnp.asarray(noise),
        width=W, height=H, max_path_length=MAXLEN,
        block_size=BLOCK, interpret=True, **kw,
    )


def test_budgeted_kernel_decomposes_into_per_block_runs():
    """A budgeted run == independent per-block runs on budget-sliced
    noise, EXACTLY (gating zeroes contributions, it never changes any
    ungated sample's arithmetic)."""
    scene, cfg, settings, params, cols, rows, noise = _setup()
    budgets = [2, 1]
    out = _run(scene, settings, params, cols, rows, noise,
               budgets=jnp.asarray(budgets, jnp.int32))
    for g, b in enumerate(budgets):
        sl = slice(g * BLOCK, (g + 1) * BLOCK)
        ref = _run(scene, settings, params, cols[sl], rows[sl],
                   noise[:b, :, sl])
        for got_c, ref_c in zip(
            (out.radiance.x[sl], out.radiance.y[sl], out.radiance.z[sl]),
            (ref.radiance.x, ref.radiance.y, ref.radiance.z),
        ):
            np.testing.assert_array_equal(np.asarray(got_c), np.asarray(ref_c))
        np.testing.assert_array_equal(
            np.asarray(out.path_len[sl]), np.asarray(ref.path_len))


def test_full_budgets_equal_unbudgeted_run():
    scene, cfg, settings, params, cols, rows, noise = _setup()
    plain = _run(scene, settings, params, cols, rows, noise)
    budgeted = _run(scene, settings, params, cols, rows, noise,
                    budgets=jnp.full((2,), S_MAX, jnp.int32), with_stats=True)
    np.testing.assert_array_equal(np.asarray(plain.radiance.x),
                                  np.asarray(budgeted.radiance.x))
    np.testing.assert_array_equal(np.asarray(plain.path_len),
                                  np.asarray(budgeted.path_len))
    assert plain.lum2 is None and budgeted.lum2 is not None


def test_lum2_stats_match_per_sample_runs():
    """with_stats accumulates sum_s luminance(sample_s total)^2: check
    against single-sample runs (whose radiance IS one sample's total)."""
    scene, cfg, settings, params, cols, rows, noise = _setup()
    budgets = [1, S_MAX]
    out = _run(scene, settings, params, cols, rows, noise,
               budgets=jnp.asarray(budgets, jnp.int32), with_stats=True)
    for g, b in enumerate(budgets):
        sl = slice(g * BLOCK, (g + 1) * BLOCK)
        manual = np.zeros(BLOCK, np.float32)
        for s in range(b):
            one = _run(scene, settings, params, cols[sl], rows[sl],
                       noise[s:s + 1, :, sl])
            lum = np.asarray(
                LUM_R * one.radiance.x + LUM_G * one.radiance.y
                + LUM_B * one.radiance.z, np.float32)
            manual += lum * lum
        np.testing.assert_allclose(
            np.asarray(out.lum2[sl]), manual, rtol=1e-6, atol=1e-7)


def test_compute_budgets_allocation():
    block = 4
    spp, min_spp = 16, 2
    n = np.full(8, 10, np.float32)
    # Block 0: constant luminance (zero variance).  Block 1: variance 1.
    r = np.full(8, 10.0, np.float32) * 10  # lum sums; use pure-red lum
    g = b = np.zeros(8, np.float32)
    mean = LUM_R * r / 10
    lum2 = (mean * mean) * 10  # exactly n * mean^2 -> var 0
    lum2[4:] += 10.0  # block 1: +E[l^2] of 1 -> var 1 per record
    buds = np.asarray(compute_budgets(
        jnp.asarray(r), jnp.asarray(g), jnp.asarray(b), jnp.asarray(lum2),
        jnp.asarray(n, jnp.int32).astype(jnp.int32),
        block_size=block, samples_per_step=spp, min_spp=min_spp, max_spp=100,
    ))
    assert buds[0] == min_spp  # zero-variance block floors
    assert buds[1] == 2 * spp - min_spp  # all the surplus
    assert buds.sum() == 2 * spp

    # The cap clips and the clip survives redistribution:
    capped = np.asarray(compute_budgets(
        jnp.asarray(r), jnp.asarray(g), jnp.asarray(b), jnp.asarray(lum2),
        jnp.asarray(n, jnp.int32),
        block_size=block, samples_per_step=spp, min_spp=min_spp, max_spp=20,
    ))
    assert capped[1] == 20
    # The spill never goes to zero-variance blocks (the step just
    # spends less when every scored block is capped):
    assert capped[0] == min_spp

    # Cold start (no samples) falls back to uniform:
    cold = np.asarray(compute_budgets(
        jnp.asarray(r * 0), jnp.asarray(g), jnp.asarray(b),
        jnp.asarray(lum2 * 0), jnp.zeros(8, jnp.int32),
        block_size=block, samples_per_step=spp, min_spp=min_spp, max_spp=100,
    ))
    np.testing.assert_array_equal(cold, [spp, spp])


def test_adaptive_step_bookkeeping_and_determinism():
    """Counts increment by each record's block budget; budgets replay
    from accumulated state (bitwise-identical reruns)."""
    scene = default_scene()
    spp = 2
    cfg = StaticConfig(width=W, height=H, max_path_length=MAXLEN,
                       pallas_interpret=spp, adaptive_min=1,
                       adaptive_max_factor=2.0)
    settings = RenderSettings.make(samples_per_step=spp)
    weights, meta = make_synthetic_nif(key=5, hidden=32, num_hidden=2,
                                       skip_layer=1)
    env = NifEnv(params=make_params(weights, meta, jnp.bfloat16))
    base = make_base_key(7)

    def run(n_steps):
        work = to_device_batch(make_worklist(W, H))
        lum2 = jnp.zeros(work.u.shape[0], jnp.float32)
        for step in range(1, n_steps + 1):
            work, lum2 = adaptive_render_step(
                scene, settings, cfg, work, lum2,
                jax.random.fold_in(base, step), env)
        return work, lum2

    work1, lum2_1 = run(1)
    # Cold start is uniform:
    np.testing.assert_array_equal(np.asarray(work1.sample_count), spp)

    work3, lum2_3 = run(3)
    # Counts == cumulative per-block budgets, replayed via the
    # controller on the (deterministic) accumulated state:
    work, lum2 = work1, lum2_1
    expect = np.asarray(work1.sample_count).copy()
    for step in (2, 3):
        buds = compute_budgets(
            work.r, work.g, work.b, lum2, work.sample_count,
            block_size=BLOCK, samples_per_step=spp,
            min_spp=min(cfg.adaptive_min, spp),
            max_spp=int(cfg.adaptive_max_factor * spp),
        )
        expect += np.repeat(np.asarray(buds), BLOCK)
        work, lum2 = adaptive_render_step(
            scene, settings, cfg, work, lum2,
            jax.random.fold_in(base, step), env)
    np.testing.assert_array_equal(np.asarray(work3.sample_count), expect)
    np.testing.assert_array_equal(np.asarray(work3.r), np.asarray(work.r))
    np.testing.assert_array_equal(np.asarray(lum2_3), np.asarray(lum2))

    # Full rerun is bitwise identical:
    work3b, lum2_3b = run(3)
    np.testing.assert_array_equal(np.asarray(work3.r), np.asarray(work3b.r))
    np.testing.assert_array_equal(np.asarray(lum2_3), np.asarray(lum2_3b))


def _nif_assets_dir(tmp_path):
    """Reference-format NIF assets dir from synthetic weights."""
    from ipu_path_trace_tpu.models.train_nif import save_assets

    weights, meta = make_synthetic_nif(key=3, hidden=32, num_hidden=2,
                                       skip_layer=1)
    out = str(tmp_path / "nif_assets")
    save_assets(out, weights, meta, ["synthetic"])
    return out


def _app_cfg(tmp_path, tag, **kw):
    from ipu_path_trace_tpu.runtime.config import Config

    spp = 2
    base = dict(
        outfile=str(tmp_path / f"ad_{tag}.png"),
        assets=_nif_assets_dir(tmp_path),
        width=32, height=16,  # 512 records = 2 interpret blocks
        samples=4, samples_per_step=spp, save_interval=1, seed=5,
        max_path_length=3, device_film=True, adaptive=True,
        adaptive_min=1, adaptive_max_factor=1.5,
        # Host-noise mode: the production Pallas megastep (emulated on
        # CPU) - the only kernel that carries the budget controller.
        pallas_interpret=spp,
    )
    base.update(kw)
    cfg = Config(**base)
    cfg.validate()
    return cfg


def _app_run(cfg, max_steps=None):
    from ipu_path_trace_tpu.runtime.app import PathTracerApp

    app = PathTracerApp(cfg)
    app.init()
    app.build()
    return app.execute(max_steps=max_steps)


def test_adaptive_app_end_to_end(tmp_path):
    """--adaptive through the full application loop (device-film mode,
    fused megastep in host-noise mode on CPU): finite image, outputs
    saved, and the run is reproducible."""
    film = _app_run(_app_cfg(tmp_path, "e2e"))
    hdr = film.hdr_at_step(1)
    assert np.isfinite(hdr).all() and hdr.max() > 0
    import os

    assert os.path.exists(str(tmp_path / "ad_e2e.png"))
    film2 = _app_run(_app_cfg(tmp_path, "e2e2"))
    np.testing.assert_array_equal(film2.hdr_at_step(1), hdr)


def test_adaptive_resume_bitwise(tmp_path):
    """Interrupt + resume an adaptive render: the lum2 moments ride the
    checkpoint, budgets replay from restored state, and the result is
    bitwise-identical to the uninterrupted run."""
    full = _app_run(_app_cfg(tmp_path, "full"))
    full_hdr = full.hdr_at_step(1).copy()
    ck = str(tmp_path / "ad_state.npz")
    _app_run(_app_cfg(tmp_path, "a", checkpoint=ck), max_steps=1)
    second = _app_run(_app_cfg(tmp_path, "b", resume=ck))
    np.testing.assert_array_equal(second.hdr_at_step(1), full_hdr)


def test_adaptive_cli_and_validation(tmp_path):
    from ipu_path_trace_tpu.runtime.cli import parse_config
    import pytest

    with pytest.raises(ValueError, match="device-film"):
        parse_config(["-o", "out.png", "--assets", "x", "--adaptive"])
    cfg = parse_config(["-o", "out.png", "--assets", "x", "--adaptive", "--device-film",
                        "--adaptive-min", "4", "--adaptive-max-factor", "3"])
    assert cfg.adaptive and cfg.adaptive_min == 4
    assert cfg.adaptive_max_factor == 3.0
    with pytest.raises(ValueError, match="adaptive-min"):
        parse_config(["-o", "out.png", "--assets", "x", "--adaptive", "--device-film",
                      "--adaptive-min", "0"])
    # A non-NIF environment fails at build time with a clear error:
    from ipu_path_trace_tpu.runtime.app import PathTracerApp

    bad = _app_cfg(tmp_path, "bad", assets="constant:1,1,1")
    app = PathTracerApp(bad)
    app.init()
    with pytest.raises(ValueError, match="NIF"):
        app.build()


def test_pallas_interpret_must_match_spp():
    """The host-noise replay knob OVERRIDES the per-step sample count;
    a silent mismatch would render the wrong total."""
    import pytest

    from ipu_path_trace_tpu.runtime.config import Config

    cfg = Config(assets="x", samples=8, samples_per_step=4, pallas_interpret=2)
    with pytest.raises(ValueError, match="pallas_interpret"):
        cfg.validate()
    Config(assets="x", samples=8, samples_per_step=4,
           pallas_interpret=4).validate()


def test_load_exe_without_adaptive_program_fails_loudly(tmp_path):
    """--load-exe of an executable saved without --adaptive must not
    silently JIT-compile the adaptive program (exe_cache's fail-loud
    design)."""
    import pytest

    from ipu_path_trace_tpu.runtime.app import PathTracerApp
    from ipu_path_trace_tpu.runtime.config import Config

    assets = _nif_assets_dir(tmp_path)
    prefix = str(tmp_path / "prog")
    cfg1 = Config(outfile=str(tmp_path / "s.png"), assets=assets,
                  width=16, height=16, samples=2, samples_per_step=2,
                  save_exe=prefix, compile_only=True)
    cfg1.validate()
    app = PathTracerApp(cfg1)
    app.init()
    app.build()

    cfg2 = Config(outfile=str(tmp_path / "l.png"), assets=assets,
                  width=16, height=16, samples=2, samples_per_step=2,
                  load_exe=prefix, device_film=True, adaptive=True,
                  adaptive_min=1)
    cfg2.validate()
    app2 = PathTracerApp(cfg2)
    app2.init()
    with pytest.raises(RuntimeError, match="path_trace_adaptive"):
        app2.build()


def test_adaptive_budgets_shift_toward_variance():
    """After a warmup step the sampler must allocate more samples to the
    higher-variance half of the frame than to the sky half."""
    scene = default_scene()
    spp = 2
    cfg = StaticConfig(width=W, height=H, max_path_length=MAXLEN,
                       pallas_interpret=spp, adaptive_min=1,
                       adaptive_max_factor=2.0)
    settings = RenderSettings.make(samples_per_step=spp)
    weights, meta = make_synthetic_nif(key=5, hidden=32, num_hidden=2,
                                       skip_layer=1)
    env = NifEnv(params=make_params(weights, meta, jnp.bfloat16))
    work = to_device_batch(make_worklist(W, H))
    lum2 = jnp.zeros(work.u.shape[0], jnp.float32)
    work, lum2 = adaptive_render_step(
        scene, settings, cfg, work, lum2, make_base_key(9), env)
    buds = np.asarray(compute_budgets(
        work.r, work.g, work.b, lum2, work.sample_count,
        block_size=BLOCK, samples_per_step=spp, min_spp=1, max_spp=4,
    ))
    var = np.asarray(lum2) / spp - (np.asarray(
        LUM_R * work.r + LUM_G * work.g + LUM_B * work.b) / spp) ** 2
    blocks = var.reshape(-1, BLOCK).sum(axis=1)
    assert buds[np.argmax(blocks)] >= buds[np.argmin(blocks)]
    assert buds.min() >= 1 and buds.max() <= 4
