"""Runtime layer tests: worklists, load balancer, async task, CLI, config."""

import numpy as np
import pytest

from ipu_path_trace_tpu.core.records import TRACE_RECORD_DTYPE
from ipu_path_trace_tpu.runtime.async_task import AsyncTask
from ipu_path_trace_tpu.runtime.cli import parse_config
from ipu_path_trace_tpu.runtime.config import Config
from ipu_path_trace_tpu.runtime.worklist import (
    LoadBalancer,
    calculate_max_rays_per_tile,
    coherent_order,
    create_tracing_jobs,
    primary_hit_class,
)


def test_trace_record_layout():
    assert TRACE_RECORD_DTYPE.itemsize == 20  # TraceRecord.hpp parity


def test_max_rays_per_tile():
    # 1104x1000 over 1472 tiles: ceil(1104000/1472) = 750 = 125*6 workers
    assert calculate_max_rays_per_tile(1104, 1000) == 750
    # Minimum is one per worker:
    assert calculate_max_rays_per_tile(2, 2) == 6


def test_create_tracing_jobs_padding():
    wl = create_tracing_jobs(100, 100)
    assert len(wl) % 1472 == 0
    n = 100 * 100
    assert (wl["u"][n:] == 0xFFFF).all()
    assert (wl["u"][:n] != 0xFFFF).any()


def test_load_balancer_redeal():
    lb = LoadBalancer(24, num_tiles=4)
    wl = np.zeros(24, TRACE_RECORD_DTYPE)
    wl["pathLength"] = np.arange(24)
    wl["u"] = np.arange(24)
    lb.work.inactive = wl
    lb.allocate_work_by_path_length()
    out = lb.work.inactive
    # Reference deal: tile k round r gets pair (lo[r*T+k], hi[r*T+k]);
    # tile 0 = [(0,23),(4,19),(8,15)] flattened first.
    assert list(out["pathLength"][:6]) == [0, 23, 4, 19, 8, 15]
    # All work preserved:
    assert sorted(out["pathLength"]) == list(range(24))


@pytest.mark.parametrize("n,tiles", [(24, 4), (26, 4), (23, 4), (7, 3), (5, 8)])
def test_load_balancer_native_numpy_parity(n, tiles):
    """The NumPy fallback must replay the C++ deal exactly for ANY size,
    including non-divisible and odd worklists (pt_load_balance)."""
    from ipu_path_trace_tpu.runtime import native

    if not native.available():
        pytest.skip("native library not built")
    wl = np.zeros(n, TRACE_RECORD_DTYPE)
    rng = np.random.default_rng(n * 31 + tiles)
    # Distinct path lengths: std::sort is unstable, so ties could
    # legitimately permute; the deal itself must match exactly.
    wl["pathLength"] = rng.permutation(n)
    wl["u"] = np.arange(n)

    lb_native = LoadBalancer(n, num_tiles=tiles)
    lb_native.work.inactive = wl.copy()
    lb_native.allocate_work_by_path_length()

    lb_numpy = LoadBalancer(n, num_tiles=tiles)
    lb_numpy.work.inactive = wl.copy()
    had = native._lib
    try:
        native._lib = None
        lb_numpy.allocate_work_by_path_length()
    finally:
        native._lib = had

    assert (lb_native.work.inactive == lb_numpy.work.inactive).all()


def test_load_balancer_clear_and_sum():
    lb = LoadBalancer(10)
    wl = np.zeros(10, TRACE_RECORD_DTYPE)
    wl["pathLength"] = 3
    wl["r"] = 1.5
    wl["sampleCount"] = 7
    lb.work.inactive = wl
    total = lb.clear_inactive_accumulators()
    assert total == 30
    assert (lb.work.inactive["r"] == 0).all()
    assert (lb.work.inactive["sampleCount"] == 0).all()


def test_worklist_swap():
    lb = LoadBalancer(4)
    lb.work.active["u"] = 1
    lb.work.inactive["u"] = 2
    lb.work.swap()
    assert (lb.work.active["u"] == 2).all()


def test_async_task():
    t = AsyncTask()
    result = []
    t.run(lambda: result.append(1))
    t.wait_for_completion()
    assert result == [1]
    # Exceptions propagate:
    t.run(lambda: 1 / 0)
    with pytest.raises(ZeroDivisionError):
        t.wait_for_completion()
    # Double-run without wait raises (AsyncTask.hpp:24-28):
    import time

    t.run(lambda: time.sleep(0.2))
    with pytest.raises(RuntimeError):
        t.run(lambda: None)
    t.wait_for_completion()


def test_coherent_order_is_a_sorted_permutation():
    """The coherent layout (runtime/worklist.coherent_order) must be a
    pure permutation - padding first, primary-hit classes non-decreasing,
    raster order within a class (stable sort => deterministic)."""
    from ipu_path_trace_tpu.core.scene import default_scene

    w, h, fov = 96, 80, 90.0
    scene = default_scene()
    wl = create_tracing_jobs(w, h)
    out = coherent_order(wl, scene, w, h, fov)
    # Permutation: same multiset of (u, v) pairs.
    key_in = np.sort(wl["v"].astype(np.int64) * 0x10000 + wl["u"])
    key_out = np.sort(out["v"].astype(np.int64) * 0x10000 + out["u"])
    assert (key_in == key_out).all()
    cls = primary_hit_class(scene, out["u"], out["v"], w, h, fov)
    assert (np.diff(cls) >= 0).all(), "classes must be non-decreasing"
    assert cls[0] == -1 and (out["u"][cls == -1] == 0xFFFF).all()
    # The default scene's central rays cover sky + at least two material
    # classes at this resolution (guards the key computation itself):
    assert len(np.unique(cls)) >= 4
    # Deterministic:
    again = coherent_order(wl, scene, w, h, fov)
    assert (again == out).all()


def test_coherent_order_shards_balance_classes():
    """With shards > 1 each contiguous chunk must stay internally sorted
    (the early-out needs homogeneous blocks per chip) while classes are
    dealt round-robin so no chip gets all the short sky paths."""
    from ipu_path_trace_tpu.core.scene import default_scene

    w, h, fov, shards = 64, 64, 90.0, 4
    scene = default_scene()
    wl = create_tracing_jobs(w, h, multiple_of=shards)
    out = coherent_order(wl, scene, w, h, fov, shards=shards)
    n = len(out) // shards
    fracs = []
    for i in range(shards):
        chunk = out[i * n:(i + 1) * n]
        cls = primary_hit_class(scene, chunk["u"], chunk["v"], w, h, fov)
        assert (np.diff(cls) >= 0).all()
        fracs.append((cls <= 0).mean())  # sky+padding fraction per chip
    assert max(fracs) - min(fracs) < 0.02, f"class imbalance: {fracs}"


def test_primary_hit_class_matches_oracle():
    """Guards the class key against unit/convention drift (degrees vs
    radians bit once): the same classes must fall out of the independent
    NumPy oracle's camera + intersect, which share no code with the jax
    path and take radians explicitly."""
    from ipu_path_trace_tpu.core.scene import Material, default_scene
    from ipu_path_trace_tpu.cpu import oracle as orc

    w, h, fov_deg = 48, 40, 90.0
    scene = default_scene()
    wl = create_tracing_jobs(w, h)
    got = primary_hit_class(scene, wl["u"], wl["v"], w, h, fov_deg)

    osc = orc.oracle_scene_from(scene)
    real = wl["u"] != 0xFFFF
    cols = wl["u"][real].astype(np.float32)
    rows = wl["v"][real].astype(np.float32)
    d = orc._camera_rays(cols, rows, w, h, np.deg2rad(fov_deg))
    t, obj = orc._intersect(osc, np.zeros_like(d), d)
    miss = ~np.isfinite(t)
    emissive = osc.emission[obj].max(axis=-1) > 0
    mat = osc.material[obj]
    want = np.where(
        miss, 0,
        np.where(emissive, 1,
                 np.where(mat == int(Material.DIFFUSE), 2,
                          np.where(mat == int(Material.SPECULAR), 3, 4))))
    # Float32 discontinuities at silhouettes may flip the odd pixel:
    assert (got[real] == want).mean() > 0.999
    assert (got[~real] == -1).all()


def test_cli_layout_flag():
    base = ["-o", "o.png", "--assets", "constant:1,1,1"]
    assert parse_config(base).layout == "coherent"
    assert parse_config(base + ["--layout", "raster"]).layout == "raster"
    with pytest.raises(SystemExit):
        parse_config(base + ["--layout", "zigzag"])
    with pytest.raises(ValueError):
        Config(outfile="o.png", assets="constant:1,1,1",
               layout="zigzag").validate()


def test_cli_parity_flags():
    cfg = parse_config(
        [
            "-o", "out.png", "--assets", "constant:1,1,1",
            "-w", "512", "-H", "384", "-s", "1000", "--samples-per-step", "100",
            "-n", "1.33", "-a", "0.5", "--fov", "60", "--seed", "42",
            "--aa-noise-type", "uniform", "--enable-load-balancing",
            "--max-path-length", "6", "--ipus", "2",
        ]
    )
    assert cfg.width == 512 and cfg.height == 384
    assert cfg.samples == 1000 and cfg.samples_per_step == 100
    assert cfg.refractive_index == 1.33 and cfg.aa_noise_scale == 0.5
    assert cfg.enable_load_balancing and cfg.max_path_length == 6
    assert cfg.ipus == 2 and cfg.seed == 42


def test_cli_save_load_exclusive():
    with pytest.raises(ValueError):
        parse_config(
            ["-o", "o.png", "--assets", "constant:1,1,1",
             "--save-exe", "a", "--load-exe", "b"]
        )


def test_cli_requires_assets_and_outfile():
    with pytest.raises(SystemExit):
        parse_config(["-o", "o.png"])  # missing --assets
    with pytest.raises(SystemExit):
        parse_config(["--assets", "constant:1,1,1"])  # missing -o


def test_bad_assets_fail_fast():
    """init() must reject an unloadable --assets before build/compile
    (loadNifModels fail-fast semantics, PathTracerApp.cpp:106-123)."""
    from ipu_path_trace_tpu.runtime.app import PathTracerApp

    app = PathTracerApp(Config(assets="/nonexistent/nif_dir"))
    with pytest.raises(ValueError, match="could not load environment"):
        app.init()


def test_stepwise_spp_wire_clip_rejected():
    cfg = Config(assets="constant:1,1,1", samples=70000,
                 samples_per_step=70000)
    with pytest.raises(ValueError, match="65535"):
        cfg.validate()
    # device-film keeps int32 counts; the same step size is allowed:
    Config(assets="constant:1,1,1", samples=70000, samples_per_step=70000,
           device_film=True).validate()


def test_failed_nif_hotswap_keeps_film():
    """A UI load_nif with a bad path must not trigger a film-destroying
    restart; valid field updates alongside it still restart."""
    from ipu_path_trace_tpu.runtime.app import PathTracerApp

    app = PathTracerApp(Config(assets="constant:1,1,1"))
    app.init()
    env_before = app.env
    state = {"interactive_samples": 8}
    assert app._process_user_input(
        {"load_nif": "/nonexistent"}, state, None) == "none"
    assert app.env is env_before
    # A failed swap combined with a real change still restarts:
    assert app._process_user_input(
        {"load_nif": "/nonexistent", "fov": 60.0}, state, None) == "restart"
    # Invalid interactive sample counts from the wire are ignored:
    app._process_user_input({"interactive_samples": 0, "fov": 50.0},
                            state, None)
    assert state["interactive_samples"] == 8


def test_spp_rounding():
    cfg = Config(samples=1000, samples_per_step=300, assets="constant:1,1,1")
    # roundSamplesPerPixel: 1000 -> 1200 (PathTracerApp.cpp:19-27)
    assert cfg.rounded_samples_per_pixel() == 1200


def test_cli_save_then_load_exe_end_to_end(tmp_path):
    """--save-exe --compile-only then --load-exe through the real CLI:
    the AOT-loaded render must equal the JIT render bitwise."""
    import numpy as np

    from ipu_path_trace_tpu.film.imageio import read_exr
    from ipu_path_trace_tpu.runtime.cli import main

    common = ["--assets", "constant:0.9,0.8,0.7", "-w", "24", "-H", "24",
              "-s", "4", "--samples-per-step", "2", "--model"]
    exe = str(tmp_path / "prog")
    assert main(common + ["-o", str(tmp_path / "c.png"),
                          "--save-exe", exe, "--compile-only"]) == 0
    assert main(common + ["-o", str(tmp_path / "aot.png"),
                          "--load-exe", exe]) == 0
    assert main(common + ["-o", str(tmp_path / "jit.png")]) == 0
    np.testing.assert_array_equal(
        read_exr(str(tmp_path / "aot.exr")), read_exr(str(tmp_path / "jit.exr")))


def test_readme_commands_parse():
    """Docs-rot guard: every complete tpu_trace command in README's bash
    blocks must parse through the real CLI parser (catches flag renames
    that would strand the documentation)."""
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    text = open(os.path.join(repo, "README.md")).read()
    # Join backslash continuations, then pick tpu_trace lines without
    # the '...' placeholder:
    joined = re.sub(r"\\\n\s*", " ", text)
    cmds = [l.strip() for l in joined.splitlines()
            if l.strip().startswith("tpu_trace ") and "..." not in l]
    assert len(cmds) >= 4, cmds
    for cmd in cmds:
        argv = cmd.split()[1:]
        cfg = parse_config(argv)  # raises SystemExit/ValueError on rot
        assert cfg.outfile
