"""Unit tests for core math: vectors, camera, geometry, BSDFs."""

import numpy as np
import jax
import jax.numpy as jnp

from ipu_path_trace_tpu.core import (
    Scene,
    Vec3,
    default_scene,
    intersect_scene,
    pixel_to_ray,
    reflect,
    refract,
    roulette_weight,
    sample_diffuse,
)
from ipu_path_trace_tpu.core.vecmath import orthonormal_basis
from ipu_path_trace_tpu.core.envmap import equirect_uv


def vec(*rows):
    a = np.asarray(rows, np.float32).reshape(-1, 3)
    return Vec3(jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]), jnp.asarray(a[:, 2]))


def test_vec3_ops():
    a = vec((1, 2, 3))
    b = vec((4, 5, 6))
    assert np.allclose(np.asarray((a + b).stack()), [[5, 7, 9]])
    assert np.allclose(np.asarray(a.dot(b)), [32.0])
    assert np.allclose(np.asarray(a.cross(b).stack()), [[-3, 6, -3]])
    n = a.normalized()
    assert np.allclose(np.asarray(n.norm2()), [1.0], atol=1e-6)


def test_orthonormal_basis():
    dirs = np.random.default_rng(0).normal(size=(128, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    # Include the axis-aligned degenerate candidates:
    dirs[0] = [0, 1, 0]
    dirs[1] = [1, 0, 0]
    dirs[2] = [0, 0, 1]
    n = Vec3(jnp.asarray(dirs[:, 0]), jnp.asarray(dirs[:, 1]), jnp.asarray(dirs[:, 2]))
    t1, t2 = orthonormal_basis(n)
    for t in (t1, t2):
        assert np.allclose(np.asarray(t.norm2()), 1.0, atol=1e-5)
        assert np.allclose(np.asarray(t.dot(n)), 0.0, atol=1e-5)
    assert np.allclose(np.asarray(t1.dot(t2)), 0.0, atol=1e-5)


def test_pixel_to_ray_center_and_fov():
    # Center pixel looks straight down -z:
    c = jnp.asarray([128.0])
    r = jnp.asarray([128.0])
    d = pixel_to_ray(c, r, 256, 256, jnp.float32(np.pi / 2))
    assert np.allclose(np.asarray(d.stack()), [[0, 0, -1]], atol=1e-6)
    # Right edge at 90 degrees fov -> x = tan(45 deg) = 1:
    d = pixel_to_ray(jnp.asarray([256.0]), r, 256, 256, jnp.float32(np.pi / 2))
    assert np.allclose(np.asarray(d.x), [1.0], atol=1e-5)
    # Top row maps to +y:
    d = pixel_to_ray(c, jnp.asarray([0.0]), 256, 256, jnp.float32(np.pi / 2))
    assert float(d.y[0]) > 0


def test_sphere_intersection():
    scene = default_scene()
    # Shoot a ray straight at the middle sphere's centre:
    center = np.asarray(scene.sphere_center)[1]
    d = Vec3(*[jnp.asarray([v], jnp.float32) for v in center / np.linalg.norm(center)])
    o = Vec3.zeros((1,))
    hit = intersect_scene(scene, o, d)
    assert bool(hit.valid[0])
    expected_t = np.linalg.norm(center) - float(np.asarray(scene.sphere_radius)[1])
    assert abs(float(hit.t[0]) - expected_t) < 1e-3
    # Normal points back toward the origin:
    assert float(hit.normal.dot(d)[0]) < 0
    assert int(hit.obj[0]) == 1
    assert int(hit.material[0]) == 1  # specular


def test_disc_intersection():
    scene = default_scene()
    # Straight down at the floor disc centre from above:
    o = Vec3(jnp.asarray([0.0]), jnp.asarray([1.0]), jnp.asarray([-5.22]))
    d = Vec3(jnp.asarray([0.0]), jnp.asarray([-1.0]), jnp.asarray([0.0]))
    hit = intersect_scene(scene, o, d)
    assert bool(hit.valid[0])
    assert abs(float(hit.t[0]) - 2.6) < 1e-4  # 1 - (-1.6)
    assert int(hit.obj[0]) == scene.num_spheres  # first disc
    # Miss beyond the radius:
    o2 = Vec3(jnp.asarray([10.0]), jnp.asarray([1.0]), jnp.asarray([-5.22]))
    hit2 = intersect_scene(scene, o2, d)
    assert not bool(hit2.valid[0])


def test_ray_miss_escapes():
    scene = default_scene()
    d = Vec3(jnp.asarray([0.0]), jnp.asarray([1.0]), jnp.asarray([0.0]))  # straight up
    hit = intersect_scene(scene, Vec3.zeros((1,)), d)
    assert not bool(hit.valid[0])


def test_reflect():
    d = vec((1, -1, 0))
    d = d.normalized()
    n = vec((0, 1, 0))
    r = reflect(d, n)
    expect = np.asarray([1, 1, 0]) / np.sqrt(2)
    assert np.allclose(np.asarray(r.stack())[0], expect, atol=1e-6)


def test_refract_enters_glass():
    # Normal incidence, rand=1 forces refraction (rand > Rprob):
    d = vec((0, -1, 0))
    n = vec((0, 1, 0))
    new_d, refracted = refract(d, n, jnp.float32(1.5), jnp.asarray([1.0]))
    assert bool(refracted[0])
    assert np.allclose(np.asarray(new_d.stack())[0], [0, -1, 0], atol=1e-6)
    # rand=0 forces reflection:
    new_d, refracted = refract(d, n, jnp.float32(1.5), jnp.asarray([0.0]))
    assert not bool(refracted[0])
    assert np.allclose(np.asarray(new_d.stack())[0], [0, 1, 0], atol=1e-6)


def test_refract_snell_angle():
    # 45 degrees incidence air->glass: sin(t) = sin(45)/1.5
    d = vec((1, -1, 0)).normalized()
    n = vec((0, 1, 0))
    new_d, refracted = refract(d, n, jnp.float32(1.5), jnp.asarray([1.0]))
    assert bool(refracted[0])
    sin_t = float(new_d.x[0])  # horizontal component of unit refracted dir
    assert abs(sin_t - np.sin(np.pi / 4) / 1.5) < 1e-5


def test_roulette():
    stop, w = roulette_weight(jnp.asarray([0.1, 0.9]), jnp.float32(0.3))
    assert bool(stop[0]) and not bool(stop[1])
    assert np.allclose(np.asarray(w), 1.0 / 0.7)


def test_diffuse_hemisphere():
    key = jax.random.key(0)
    n = 4096
    u1, u2 = jax.random.uniform(key, (2, n))
    normal = Vec3.full((n,), 0.0, 1.0, 0.0)
    d, cos_t = sample_diffuse(normal, u1, u2)
    cos_np = np.asarray(cos_t)
    assert (cos_np >= -1e-6).all() and (cos_np <= 1 + 1e-6).all()
    assert np.allclose(np.asarray(d.norm2()), 1.0, atol=1e-5)
    # Uniform hemisphere: E[cos] = 0.5
    assert abs(cos_np.mean() - 0.5) < 0.02


def test_equirect_uv():
    # Straight up (+y) -> theta 0 -> u = 0:
    d = vec((0, 1, 0))
    u, v = equirect_uv(d, jnp.float32(0.0))
    assert abs(float(u[0])) < 1e-6
    # +x axis: theta = pi/2, phi = 0 -> u = 0.5, v = 0:
    d = vec((1, 0, 0))
    u, v = equirect_uv(d, jnp.float32(0.0))
    assert abs(float(u[0]) - 0.5) < 1e-6
    assert abs(float(v[0])) < 1e-6
    # Azimuth wraps into [0, 1]:
    u, v = equirect_uv(d, jnp.float32(-0.1))
    assert 0.0 <= float(v[0]) <= 1.0
