"""JSON scene loader (--scene, core/scenefile.py)."""

import glob
import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from ipu_path_trace_tpu.core.scene import Material, default_scene
from ipu_path_trace_tpu.core.scenefile import load_scene, scene_from_dict


def _obj(**kw):
    base = {"type": "sphere", "center": [0, 0, -3], "radius": 1.0}
    base.update(kw)
    return base


def test_loads_example_scene():
    s = load_scene(os.path.join(REPO, "assets/scenes/three_spheres.json"))
    assert s.num_spheres == 4 and s.num_objects == 6
    assert bool(s.emissive[3]) and not bool(s.emissive[0])
    assert s.material.tolist()[:3] == [
        int(Material.DIFFUSE), int(Material.SPECULAR), int(Material.REFRACTIVE)
    ]
    # Disc normals are normalised by make_scene:
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(s.disc_normal), axis=1), 1.0, rtol=1e-6
    )


@pytest.mark.parametrize("path", sorted(glob.glob(os.path.join(REPO, "assets/scenes/*.json"))))
def test_shipped_scenes_load_and_render(path):
    """Every shipped scene file parses, has at least one light, and renders
    finite radiance (the emitter must reach the film through a near-black
    env)."""
    import jax
    import jax.numpy as jnp

    from ipu_path_trace_tpu.core.records import (
        from_device_batch, make_worklist, to_device_batch)
    from ipu_path_trace_tpu.film import Film
    from ipu_path_trace_tpu.models import TextureEnv
    from ipu_path_trace_tpu.render import RenderSettings, StaticConfig
    from ipu_path_trace_tpu.render.wavefront import render_step

    s = load_scene(path)
    assert s.num_objects >= 2
    assert bool(np.asarray(s.emissive).any()), "scene has no light source"
    W = H = 32
    cfg = StaticConfig(width=W, height=H)
    tex = jnp.full((4, 8, 3), 0.02, jnp.float32)
    out = render_step(
        s, RenderSettings.make(samples_per_step=16), cfg,
        to_device_batch(make_worklist(W, H)), jax.random.key(7),
        TextureEnv(texture=tex))
    film = Film(W, H)
    film.accumulate(from_device_batch(out))
    hdr = film.hdr_at_step(1)
    assert np.isfinite(hdr).all()
    assert hdr.max() > 0.5  # the emitter is visible


def test_roundtrips_default_scene(tmp_path):
    """A JSON transcription of the built-in scene loads to identical arrays."""
    ref = default_scene()
    objs = []
    for i in range(ref.num_spheres):
        objs.append({
            "type": "sphere",
            "center": np.asarray(ref.sphere_center[i]).tolist(),
            "radius": float(ref.sphere_radius[i]),
            "colour": np.asarray(ref.colour[i]).tolist(),
            "emission": np.asarray(ref.emission[i]).tolist(),
            "material": ["diffuse", "specular", "refractive"][int(ref.material[i])],
        })
    for j in range(ref.num_objects - ref.num_spheres):
        k = ref.num_spheres + j
        objs.append({
            "type": "disc",
            "normal": np.asarray(ref.disc_normal[j]).tolist(),
            "center": np.asarray(ref.disc_center[j]).tolist(),
            "radius": float(ref.disc_radius[j]),
            "colour": np.asarray(ref.colour[k]).tolist(),
            "emission": np.asarray(ref.emission[k]).tolist(),
            "material": ["diffuse", "specular", "refractive"][int(ref.material[k])],
        })
    p = tmp_path / "default.json"
    p.write_text(json.dumps({"objects": objs}))
    got = load_scene(str(p))
    for f in ref._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(got, f)), np.asarray(getattr(ref, f)),
            rtol=1e-6, err_msg=f,
        )


@pytest.mark.parametrize(
    "doc,msg",
    [
        ({}, "objects"),
        ({"objects": []}, "objects"),
        ({"objects": [_obj(type="box")]}, "type"),
        ({"objects": [_obj(material="metal")]}, "material"),
        ({"objects": [_obj(radius=0)]}, "radius"),
        ({"objects": [_obj(center=[1, 2])]}, "center"),
        # Non-numeric entries must raise ValueError (not TypeError, which
        # would escape load_scene's file-context wrapper):
        ({"objects": [_obj(center=[1, 2, None])]}, "only numbers"),
        ({"objects": [_obj(radius=None)]}, "radius must be a number"),
    ],
)
def test_rejects_bad_documents(doc, msg):
    with pytest.raises(ValueError, match=msg):
        scene_from_dict(doc)


def test_cli_renders_custom_scene(tmp_path):
    """End to end: --scene through the CLI produces a finite image in
    which the emissive ball actually lights the frame."""
    from ipu_path_trace_tpu.film.imageio import read_exr
    from ipu_path_trace_tpu.runtime.cli import main

    out = tmp_path / "scene.png"
    rc = main([
        "-o", str(out), "--assets", "constant:0.05,0.05,0.08",
        "--scene", os.path.join(REPO, "assets/scenes/three_spheres.json"),
        "-w", "24", "-H", "24", "-s", "8", "--samples-per-step", "4",
    ])
    assert rc == 0
    assert out.exists()
    hdr = read_exr(str(out.with_suffix(".exr")))
    assert np.isfinite(hdr).all()
    # The env is nearly black; any significant radiance must come from
    # the emissive sphere:
    assert hdr.max() > 0.5
