"""Auto --env-skip: build-time dead-block probe and decision rule.

The skip itself is exact (tests/test_megastep.py::test_megastep_env_skip
_exact); these tests pin the POLICY layer: the probe measures the same
dead-block criterion the kernel guard tests, "auto" resolves on for
enclosed scenes and off for open ones, and the flag still forces either
way (the reference always pays the full escaped-ray batch,
codelets.cpp:348-352 - auto mode is the TPU-native improvement).
"""

import json

import jax.numpy as jnp
import numpy as np

from ipu_path_trace_tpu.core.records import make_worklist
from ipu_path_trace_tpu.core.scene import default_scene
from ipu_path_trace_tpu.models.nif import make_synthetic_nif
from ipu_path_trace_tpu.render.params import RenderSettings, StaticConfig
from ipu_path_trace_tpu.render.wavefront import (
    dead_block_fraction,
    make_base_key,
)
from ipu_path_trace_tpu.runtime.config import Config

W, H = 32, 16  # 512 records = 2 interpret-mode blocks of 256

# The default 5-sphere layout inside a giant emissive diffuse shell: NO
# path ever escapes, so every (block, sample) is dead (the same fixture
# scripts/envskip_bench.py measures its 7.55x bound on).
_ENCLOSED = {"objects": [
    {"type": "sphere", "center": [0.0, 0.0, 0.0], "radius": 200.0,
     "colour": [0.6, 0.6, 0.6], "material": "diffuse",
     "emission": [0.8, 0.8, 0.8]},
    {"type": "sphere", "center": [-0.75, -0.49, -3.25], "radius": 0.51,
     "colour": [0.9, 0.2, 0.2], "material": "diffuse"},
    {"type": "disc", "normal": [0.0, 1.0, 0.0],
     "center": [0.0, -1.0, -3.0], "radius": 4.0,
     "colour": [0.7, 0.7, 0.7], "material": "diffuse"},
]}


def _enclosed_scene_file(tmp_path):
    p = tmp_path / "enclosed.json"
    p.write_text(json.dumps(_ENCLOSED))
    return str(p)


def _probe(scene, block=256):
    work = make_worklist(W, H)
    return dead_block_fraction(
        scene,
        RenderSettings.make(samples_per_step=1),
        StaticConfig(width=W, height=H, max_path_length=3),
        jnp.asarray(work["u"], jnp.float32),
        jnp.asarray(work["v"], jnp.float32),
        make_base_key(7), 2, block,
    )


def test_dead_block_fraction_enclosed_vs_open(tmp_path):
    """The probe's criterion matches the kernel guard's: an enclosed
    scene is 100% dead blocks, the default open scene ~0%."""
    from ipu_path_trace_tpu.core.scenefile import load_scene

    assert _probe(load_scene(_enclosed_scene_file(tmp_path))) == 1.0
    assert _probe(default_scene()) < 0.02


def test_dead_block_fraction_counts_blocks_not_lanes():
    """Block granularity: with one block covering the whole frame, a
    single escaping lane keeps the block (and so the fraction) live."""
    frac_one_block = _probe(default_scene(), block=512)
    assert frac_one_block == 0.0


def _nif_assets_dir(tmp_path):
    from ipu_path_trace_tpu.models.train_nif import save_assets

    weights, meta = make_synthetic_nif(key=3, hidden=32, num_hidden=2,
                                       skip_layer=1)
    out = str(tmp_path / "nif_assets")
    save_assets(out, weights, meta, ["synthetic"])
    return out


def _built_app(tmp_path, tag, **kw):
    from ipu_path_trace_tpu.runtime.app import PathTracerApp

    spp = 2
    base = dict(
        outfile=str(tmp_path / f"esa_{tag}.png"),
        assets=_nif_assets_dir(tmp_path),
        width=W, height=H, samples=2, samples_per_step=spp,
        save_interval=1, seed=5, max_path_length=3,
        pallas_interpret=spp,
    )
    base.update(kw)
    cfg = Config(**base)
    cfg.validate()
    app = PathTracerApp(cfg)
    app.init()
    app.build()
    return app


def test_auto_resolves_per_scene(tmp_path):
    """Default "auto" turns the skip ON for an enclosed scene and OFF
    for the open default scene, and static_config carries the result."""
    on = _built_app(tmp_path, "enc", scene=_enclosed_scene_file(tmp_path))
    assert on._env_skip_resolved is True
    assert on.static_config().env_skip is True

    off = _built_app(tmp_path, "open")
    assert off._env_skip_resolved is False
    assert off.static_config().env_skip is False


def test_forced_modes_bypass_probe(tmp_path):
    """"on"/"off" (and legacy bools) resolve without tracing a probe."""
    app = _built_app(tmp_path, "force", env_skip="on")
    assert app._env_skip_resolved is True
    app = _built_app(tmp_path, "forceoff", env_skip="off",
                     scene=_enclosed_scene_file(tmp_path))
    assert app._env_skip_resolved is False

    legacy = Config(assets="x", env_skip=True)
    legacy.validate()
    assert legacy.env_skip == "on"
    bad = Config(assets="x", env_skip="always")
    try:
        bad.validate()
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_auto_off_without_fused_nif(tmp_path):
    """No fused NIF megastep (constant env / baked mode) -> no probe,
    skip off."""
    app = _built_app(tmp_path, "const", assets="constant:1,1,1")
    assert app._env_skip_resolved is False


def test_cli_env_skip_tristate():
    """Bare --env-skip forces on; an explicit value selects; the
    default is auto."""
    from ipu_path_trace_tpu.runtime.cli import build_parser

    p = build_parser()
    base = ["--assets", "x", "-o", "out.png"]
    assert p.parse_args(base).env_skip == "auto"
    assert p.parse_args(base + ["--env-skip"]).env_skip == "on"
    assert p.parse_args(base + ["--env-skip", "off"]).env_skip == "off"


def test_auto_render_matches_forced_value(tmp_path):
    """An "auto" render is bitwise identical to the same render with the
    resolved value forced - resolution only picks the kernel variant."""
    enc = _enclosed_scene_file(tmp_path)
    a = _built_app(tmp_path, "ra", scene=enc)
    f = _built_app(tmp_path, "rf", scene=enc, env_skip="on")
    fa = a.execute(max_steps=1)
    ff = f.execute(max_steps=1)
    np.testing.assert_array_equal(fa.hdr_at_step(1), ff.hdr_at_step(1))
