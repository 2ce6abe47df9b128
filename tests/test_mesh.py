"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipu_path_trace_tpu.core.records import make_worklist, to_device_batch
from ipu_path_trace_tpu.core.scene import default_scene
from ipu_path_trace_tpu.models.envlight import ConstantEnv
from ipu_path_trace_tpu.parallel.mesh import (
    make_mesh,
    parse_mesh_shape,
    replicate,
    shard_work,
    sharded_render_step,
)
from ipu_path_trace_tpu.render.params import RenderSettings, StaticConfig
from ipu_path_trace_tpu.render.wavefront import render_step

W, H = 32, 24


def _run(mesh, samples_local):
    scene = replicate(default_scene(), mesh)
    env = replicate(ConstantEnv(colour=jnp.asarray([1.0, 0.9, 0.8])), mesh)
    cfg = StaticConfig(width=W, height=H)
    work = shard_work(to_device_batch(make_worklist(W, H)), mesh)
    out = sharded_render_step(
        scene, RenderSettings.make(samples_per_step=samples_local), cfg, work,
        jax.random.key(3), env, mesh,
    )
    jax.block_until_ready(out)
    return out


def test_parse_mesh_shape():
    assert parse_mesh_shape("", 8) == (8, 1)
    assert parse_mesh_shape("4x2", 8) == (4, 2)
    with pytest.raises(ValueError):
        parse_mesh_shape("3x2", 8)


def test_pixel_sharding():
    mesh = make_mesh(8, "8x1")
    out = _run(mesh, 4)
    assert (np.asarray(out.sample_count) == 4).all()
    assert np.asarray(out.r).mean() > 0.0
    assert np.isfinite(np.asarray(out.r)).all()


def test_sample_axis_psum():
    """2 sample-replicas x 2 local samples == 4 samples accumulated."""
    mesh = make_mesh(8, "4x2")
    out = _run(mesh, 2)
    # psum over the sample axis doubles the local count:
    assert (np.asarray(out.sample_count) == 4).all()
    assert np.asarray(out.path_length).sum() > 0


def test_multichip_matches_singlechip_statistically():
    """Sharded and single-chip renders agree in expectation."""
    mesh = make_mesh(8, "4x2")
    out_multi = _run(mesh, 8)  # 16 effective spp
    scene = default_scene()
    env = ConstantEnv(colour=jnp.asarray([1.0, 0.9, 0.8]))
    cfg = StaticConfig(width=W, height=H)
    out_single = render_step(
        scene, RenderSettings.make(samples_per_step=16), cfg,
        to_device_batch(make_worklist(W, H)), jax.random.key(9), env,
    )
    m_multi = np.asarray(out_multi.r).sum() / np.asarray(out_multi.sample_count).sum()
    m_single = np.asarray(out_single.r).sum() / np.asarray(out_single.sample_count).sum()
    assert abs(m_multi - m_single) / max(m_single, 1e-9) < 0.15


def test_worklist_divisibility_error():
    mesh = make_mesh(8, "8x1")
    scene = replicate(default_scene(), mesh)
    env = replicate(ConstantEnv(colour=jnp.asarray([1.0, 1.0, 1.0])), mesh)
    cfg = StaticConfig(width=3, height=3)
    work = to_device_batch(make_worklist(3, 3))  # 9 not divisible by 8
    with pytest.raises(ValueError):
        sharded_render_step(
            scene, RenderSettings.make(samples_per_step=1), cfg, work,
            jax.random.key(0), env, mesh,
        )


def test_graft_dryrun():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
