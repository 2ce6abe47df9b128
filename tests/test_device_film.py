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
    try:
        t = threading.Thread(target=lambda: app.execute(ui_server=server))
        t.start()
        assert _wait(lambda: client.progress > 0, timeout=120)
        assert _wait(lambda: len(client.preview_frames) > 0, timeout=60)
        client.stop_render()
        t.join(timeout=120)
        assert not t.is_alive()
    finally:
        client.close()
        server.stop()


def test_device_film_rejects_load_balancing():
    cfg = Config(
        outfile="x.png", assets="constant:1,1,1",
        device_film=True, enable_load_balancing=True,
    )
    with pytest.raises(ValueError, match="load-balancing"):
        cfg.validate()
