"""Device-resident film mode (--device-film).

The step-wise path accumulates sum_k(rgb_k / sps) / k on the host; the
device-film path keeps the worklist on device and rebuilds the film
from the running totals: sum(rgb) / (k * sps).  With load balancing off
and identical step keys the two are the same sum in a different
association, so the films must agree to float tolerance.
"""

import numpy as np
import pytest

from ipu_path_trace_tpu.runtime.app import PathTracerApp
from ipu_path_trace_tpu.runtime.config import Config


def _render(tmp_path, device_film: bool, save_interval: int = 1):
    cfg = Config(
        outfile=str(tmp_path / f"df_{device_film}_{save_interval}.png"),
        assets="constant:0.8,0.7,0.6",
        width=16,
        height=16,
        samples=6,
        samples_per_step=2,
        save_interval=save_interval,
        seed=3,
        device_film=device_film,
    )
    app = PathTracerApp(cfg)
    app.init()
    app.build()
    film = app.execute()
    steps = cfg.rounded_samples_per_pixel() // cfg.samples_per_step
    return film.hdr_at_step(1 if device_film else steps)


def test_device_film_matches_stepwise(tmp_path):
    base = _render(tmp_path, device_film=False)
    dev = _render(tmp_path, device_film=True)
    np.testing.assert_allclose(dev, base, rtol=2e-5, atol=2e-6)
    assert np.isfinite(dev).all() and dev.max() > 0


def test_device_film_sparse_save_interval(tmp_path):
    """Fetches only every 3rd step; the final step must still be saved
    and the film must match the every-step fetch."""
    every = _render(tmp_path, device_film=True, save_interval=1)
    sparse = _render(tmp_path, device_film=True, save_interval=3)
    np.testing.assert_allclose(sparse, every, rtol=1e-6, atol=0)
    assert (tmp_path / "df_True_3.png").exists()


def test_device_film_on_mesh(tmp_path):
    """Device-resident worklist composes with the 8-device mesh: the
    sharded WorkBatch stays on device between steps and gathers only at
    the save-interval fetch."""
    import jax

    if len(jax.devices()) < 8:
        import pytest as _pytest

        _pytest.skip("needs the 8-device CPU mesh (tests/conftest.py)")
    cfg = Config(
        outfile=str(tmp_path / "df_mesh.png"),
        assets="constant:0.5,0.6,0.7",
        width=16,
        height=16,
        samples=40,  # 20 steps: exercises the step-16 queue drain
        samples_per_step=2,
        save_interval=20,
        seed=5,
        ipus=8,
        device_film=True,
    )
    app = PathTracerApp(cfg)
    app.init()
    app.build()
    film = app.execute()
    dev = film.hdr_at_step(1)
    assert np.isfinite(dev).all() and dev.max() > 0

    # Must equal the step-wise render on the SAME mesh (the per-chip RNG
    # streams differ from unsharded single-chip by design - see
    # tests/test_mesh.py - so the comparison partner is mesh+step-wise):
    cfg2 = Config(
        outfile=str(tmp_path / "df_mesh_stepwise.png"),
        assets="constant:0.5,0.6,0.7",
        width=16, height=16, samples=40, samples_per_step=2,
        save_interval=20, seed=5, ipus=8,
    )
    app2 = PathTracerApp(cfg2)
    app2.init()
    app2.build()
    film2 = app2.execute()
    steps = cfg2.rounded_samples_per_pixel() // cfg2.samples_per_step
    stepwise = film2.hdr_at_step(steps)
    np.testing.assert_allclose(dev, stepwise, rtol=2e-5, atol=2e-6)


def test_device_preview_matches_host_tonemap():
    """The on-device preview (gather by raster permutation + tone map)
    must match the host pipeline: fetch -> Film.accumulate -> ldr."""
    import jax.numpy as jnp

    from ipu_path_trace_tpu.core.records import (
        from_device_batch, make_worklist, raster_permutation, to_device_batch,
    )
    from ipu_path_trace_tpu.film.film import Film
    from ipu_path_trace_tpu.runtime.app import _device_preview
    from ipu_path_trace_tpu.runtime.worklist import LoadBalancer, create_tracing_jobs

    w = h = 8
    rng = np.random.default_rng(11)
    wl = create_tracing_jobs(w, h)  # padded with 0xFFFF dummies
    lb = LoadBalancer(len(wl))
    lb.randomise_work_list(wl)  # shuffled like the app's worklist
    wl = lb.work.inactive
    real = wl["u"] != 0xFFFF
    wl["r"][real] = rng.random(real.sum()) * 4.0
    wl["g"][real] = rng.random(real.sum()) * 4.0
    wl["b"][real] = rng.random(real.sum()) * 4.0
    wl["sampleCount"][real] = 6

    perm = jnp.asarray(raster_permutation(wl, w, h))
    dev = _device_preview(
        to_device_batch(wl), perm, jnp.float32(0.5), jnp.float32(2.2),
        width=w, height=h,
    )
    film = Film(w, h)
    film.accumulate(wl)
    host = film.ldr(1, 0.5, 2.2)
    # Same math modulo f32 pow differences; allow the odd 1-LSB flip.
    diff = np.abs(np.asarray(dev).astype(int) - host.astype(int))
    assert diff.max() <= 1, f"max LDR diff {diff.max()}"


def test_device_film_with_ui_preview(tmp_path):
    """--device-film + --ui-port: previews are produced on device and
    streamed per step; the raw HDR arrives at save-interval."""
    import threading

    from ipu_path_trace_tpu.ui.client import InterfaceClient
    from ipu_path_trace_tpu.ui.server import InterfaceServer

    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_ui import _wait

    cfg = Config(
        outfile=str(tmp_path / "df_ui.png"),
        assets="constant:0.9,0.8,0.7",
        width=16, height=16,
        samples=8, samples_per_step=2, interactive_samples=2,
        save_interval=4,
        device_film=True,
        ui_port=0,
    )
    app = PathTracerApp(cfg)
    app.init()
    app.build()
    server = InterfaceServer(0)
    server.start()
    client = InterfaceClient("127.0.0.1", server.port)
    assert server.wait_for_client(5)
    server.initialise_video_stream(cfg.width, cfg.height)
    t = None
    try:
        t = threading.Thread(target=lambda: app.execute(ui_server=server))
        t.start()
        assert _wait(lambda: client.progress > 0, timeout=120)
        assert _wait(lambda: len(client.preview_frames) > 0, timeout=60)
    finally:
        # Stop the render thread even on assertion failure (a live
        # execute() thread would wedge pytest shutdown):
        if t is not None:
            client.stop_render()
            t.join(timeout=120)
            alive = t.is_alive()
        client.close()
        server.stop()
    assert not alive
    # The remote stop must still persist -o (exit save; with a UI
    # attached save-interval images are only streamed):
    assert (tmp_path / "df_ui.png").exists()
    assert (tmp_path / "df_ui.exr").exists()


def test_accumulate_soa_over_u16_counts():
    """The device-film fetch math at >65535 samples/record: the int32
    counts must be used as-is; the 20-byte wire record clips its u16
    sampleCount and would brighten the result by total/65535."""
    import jax.numpy as jnp

    from ipu_path_trace_tpu.core.records import (
        WorkBatch, from_device_batch,
    )
    from ipu_path_trace_tpu.film.film import Film

    n, spp = 4, 100_000
    u = jnp.asarray([0, 1, 0, 1], jnp.int32)
    v = jnp.asarray([0, 0, 1, 1], jnp.int32)
    mean = np.asarray([0.25, 0.5, 1.0], np.float32)
    wb = WorkBatch(
        u=u, v=v,
        r=jnp.full((n,), float(mean[0]) * spp),
        g=jnp.full((n,), float(mean[1]) * spp),
        b=jnp.full((n,), float(mean[2]) * spp),
        sample_count=jnp.full((n,), spp, jnp.int32),
        path_length=jnp.full((n,), 3, jnp.int32),
    )
    film = Film(2, 2)
    film.accumulate_soa(wb.u, wb.v, wb.r, wb.g, wb.b, wb.sample_count)
    np.testing.assert_allclose(
        film.hdr_at_step(1), np.broadcast_to(mean, (2, 2, 3)), rtol=1e-6
    )
    # The wire record (tooling/UI interop only) clips - a film built
    # through it is provably too bright, which is the r2 bug:
    rec = from_device_batch(wb)
    assert (rec["sampleCount"] == 0xFFFF).all()
    film2 = Film(2, 2)
    film2.accumulate(rec)
    assert film2.hdr_at_step(1)[0, 0, 0] > mean[0] * 1.5


def test_device_film_execute_over_u16(tmp_path):
    """execute()'s device-film fetch at >65535 total spp, run with a
    stubbed step program (tracing 65k+ real samples on CPU is minutes):
    the saved film must hold the true per-pixel mean, not the u16-
    clipped ~1.8x-brighter value."""
    import jax.numpy as jnp

    from ipu_path_trace_tpu.core.records import WorkBatch

    cfg = Config(
        outfile=str(tmp_path / "u16_exec.png"),
        assets="constant:0.8,0.7,0.6",
        width=4,
        height=4,
        samples=120000,
        samples_per_step=40000,
        save_interval=3,
        seed=7,
        device_film=True,
    )
    app = PathTracerApp(cfg)
    app.init()
    app.build()

    mean = (0.3, 0.6, 0.9)

    def fake_step(scene, settings, work, key, env):
        sps = settings.samples_per_step
        real = (work.u < cfg.width).astype(jnp.float32)
        return WorkBatch(
            u=work.u, v=work.v,
            r=work.r + mean[0] * sps * real,
            g=work.g + mean[1] * sps * real,
            b=work.b + mean[2] * sps * real,
            sample_count=work.sample_count + sps,
            path_length=work.path_length + 2,
        )

    app.programs._programs["path_trace"] = fake_step  # test-only stub
    film = app.execute()
    hdr = film.hdr_at_step(1)
    np.testing.assert_allclose(
        hdr, np.broadcast_to(np.asarray(mean, np.float32), (4, 4, 3)),
        rtol=1e-5,
    )
    assert (tmp_path / "u16_exec.png").exists()


class _StubUI:
    """Minimal in-process stand-in for InterfaceServer: requests a stop
    after ``stop_after`` state polls and records everything sent."""

    def __init__(self, stop_after: int):
        self.stop_after = stop_after
        self.polls = 0
        self.raw_images = []
        self.previews = 0

    def state_changed(self):
        self.polls += 1
        return self.polls > self.stop_after

    def consume_state(self):
        return {"stop": True}

    def get_state(self):
        return {"exposure": 0.0, "gamma": 2.2}

    def send_preview_image(self, ldr):
        self.previews += 1

    def update_progress(self, step, steps):
        pass

    def update_sample_rate(self, s, r):
        pass

    def start_sending_raw_image(self, hdr):
        self.raw_images.append(np.array(hdr))


def test_device_film_early_stop_persists_samples(tmp_path):
    """A UI stop between sparse save-interval fetches must still flush
    the device-resident accumulation (final fetch + raw image), not
    silently discard every sample since the last save."""
    cfg = Config(
        outfile=str(tmp_path / "early_stop.png"),
        assets="constant:0.6,0.5,0.4",
        width=8,
        height=8,
        samples=40,
        samples_per_step=2,
        interactive_samples=2,
        save_interval=100,  # never reached before the stop
        seed=9,
        device_film=True,
    )
    app = PathTracerApp(cfg)
    app.init()
    app.build()
    ui = _StubUI(stop_after=4)
    film = app.execute(ui_server=ui)
    assert len(ui.raw_images) == 1, "final fetch must push the raw HDR image"
    hdr = ui.raw_images[0]
    assert np.isfinite(hdr).all() and hdr.max() > 0
    # The in-memory film carries the fetched accumulation too:
    np.testing.assert_allclose(film.hdr_at_step(1), hdr)


def test_ui_stop_persists_outfile_stepwise(tmp_path):
    """With a UI attached, save-interval images are streamed instead of
    written (PathTracerApp.cpp:750-760) - but a remote stop (and any
    UI-attached run) must still honour -o: the exit save writes the
    accumulated film to disk in the step-wise (non-device-film) path."""
    from ipu_path_trace_tpu.film.imageio import read_exr

    out = tmp_path / "ui_stop.png"
    cfg = Config(
        outfile=str(out),
        assets="constant:0.6,0.5,0.4",
        width=8,
        height=8,
        samples=40,
        samples_per_step=2,
        interactive_samples=2,
        save_interval=100,  # never reached before the stop
        seed=9,
        device_film=False,
    )
    app = PathTracerApp(cfg)
    app.init()
    app.build()
    film = app.execute(ui_server=_StubUI(stop_after=4))
    assert out.exists() and out.with_suffix(".exr").exists()
    hdr = read_exr(str(out.with_suffix(".exr")))
    assert np.isfinite(hdr).all() and hdr.max() > 0
    # The saved EXR is the film at its last accumulated step:
    steps_done = int(round(float(film.hdr.max() / hdr.max())))
    np.testing.assert_allclose(film.hdr_at_step(steps_done), hdr, rtol=1e-6)


def test_raster_permutation_rejects_bad_worklists():
    from ipu_path_trace_tpu.core.records import make_worklist, raster_permutation

    wl = make_worklist(4, 4)
    raster_permutation(wl, 4, 4)  # valid permutation passes
    wl["u"][1] = wl["u"][0]  # duplicate pixel 0, drop pixel 1
    wl["v"][1] = wl["v"][0]
    with pytest.raises(ValueError, match="not a pixel permutation"):
        raster_permutation(wl, 4, 4)
    with pytest.raises(ValueError, match="not a pixel permutation"):
        raster_permutation(make_worklist(4, 4), 4, 5)  # mismatched shape


def test_device_film_rejects_load_balancing():
    cfg = Config(
        outfile="x.png", assets="constant:1,1,1",
        device_film=True, enable_load_balancing=True,
    )
    with pytest.raises(ValueError, match="load-balancing"):
        cfg.validate()
