"""Ray/scene intersection, vectorised over the wavefront batch.

TPU-native equivalent of ``light::Scene::intersect`` as used by the trace
megakernel (reference: src/codelets/codelets.cpp:183).  The per-ray
object loop becomes a broadcast over a (batch, objects) grid with an
argmin; the object count is tiny and static so XLA fully unrolls it.

Intersection math follows the reference's smallpaint lineage:
  sphere: quadratic with b = 2(o-c).d, keep nearest root > eps;
  disc:   plane hit then radius check.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .scene import Scene
from .vecmath import Vec3

# Self-intersection epsilon. The reference's smallpaint lineage uses
# 1e-6, but float32 ray origins sitting exactly on the surface produce
# false self-hits clustered at t ~ 1e-6, exactly at that threshold -
# making hit/miss a coin-flip on fp rounding. 1e-4 rejects the entire
# self-hit cluster deterministically (scene scale is ~1-10 units).
EPS = 1e-4
_INF = jnp.inf


class Hit(NamedTuple):
    """Per-lane intersection result (SoA over the ray batch)."""

    valid: jnp.ndarray  # (P,) bool: ray hit something
    t: jnp.ndarray  # (P,) distance along ray (inf if miss)
    point: Vec3  # (P,) hit position (ray advanced to hit, Scene::intersect semantics)
    normal: Vec3  # (P,) geometric normal at hit
    obj: jnp.ndarray  # (P,) int32 object index (spheres then discs)
    colour: Vec3  # (P,) material colour of hit object
    emission: Vec3  # (P,) emission of hit object
    emissive: jnp.ndarray  # (P,) bool
    material: jnp.ndarray  # (P,) int32 Material enum


def _intersect_spheres(scene: Scene, o: Vec3, d: Vec3) -> jnp.ndarray:
    """Return (P, S) hit distances (inf = miss)."""
    cx = scene.sphere_center[:, 0]  # (S,)
    cy = scene.sphere_center[:, 1]
    cz = scene.sphere_center[:, 2]
    # o - c, broadcast (P, 1) x (S,) -> (P, S):
    ox = o.x[:, None] - cx
    oy = o.y[:, None] - cy
    oz = o.z[:, None] - cz
    b = 2.0 * (ox * d.x[:, None] + oy * d.y[:, None] + oz * d.z[:, None])
    c = ox * ox + oy * oy + oz * oz - scene.sphere_radius * scene.sphere_radius
    disc = b * b - 4.0 * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    near = (-b - sq) * 0.5
    far = (-b + sq) * 0.5
    t = jnp.where(near > EPS, near, jnp.where(far > EPS, far, _INF))
    return jnp.where(disc >= 0.0, t, _INF)


def _intersect_discs(scene: Scene, o: Vec3, d: Vec3) -> jnp.ndarray:
    """Return (P, D) hit distances (inf = miss)."""
    nx = scene.disc_normal[:, 0]  # (D,)
    ny = scene.disc_normal[:, 1]
    nz = scene.disc_normal[:, 2]
    denom = d.x[:, None] * nx + d.y[:, None] * ny + d.z[:, None] * nz  # (P, D)
    co_x = scene.disc_center[:, 0] - o.x[:, None]
    co_y = scene.disc_center[:, 1] - o.y[:, None]
    co_z = scene.disc_center[:, 2] - o.z[:, None]
    num = co_x * nx + co_y * ny + co_z * nz
    safe_denom = jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    t = num / safe_denom
    # Hit point distance from disc centre:
    px = o.x[:, None] + d.x[:, None] * t - scene.disc_center[:, 0]
    py = o.y[:, None] + d.y[:, None] * t - scene.disc_center[:, 1]
    pz = o.z[:, None] + d.z[:, None] * t - scene.disc_center[:, 2]
    inside = px * px + py * py + pz * pz <= scene.disc_radius * scene.disc_radius
    ok = (t > EPS) & inside & (jnp.abs(denom) > 1e-12)
    return jnp.where(ok, t, _INF)


def intersect_scene(scene: Scene, o: Vec3, d: Vec3) -> Hit:
    """Intersect a batch of rays with every object; keep the nearest hit.

    ``d`` must be normalised.  Mirrors ``scene.intersect(ray)`` advancing
    the ray to the hit point (codelets.cpp:183): ``point`` is the new ray
    origin for the next bounce.
    """
    num_s = scene.num_spheres
    parts = []
    if num_s:
        parts.append(_intersect_spheres(scene, o, d))
    if scene.disc_radius.shape[0]:
        parts.append(_intersect_discs(scene, o, d))
    ts = jnp.concatenate(parts, axis=1)  # (P, N)
    obj = jnp.argmin(ts, axis=1).astype(jnp.int32)  # (P,)
    t = jnp.min(ts, axis=1)
    valid = jnp.isfinite(t)
    t_safe = jnp.where(valid, t, 0.0)
    point = Vec3(o.x + d.x * t_safe, o.y + d.y * t_safe, o.z + d.z * t_safe)

    # Normal: sphere -> (p - c) normalised; disc -> stored unit normal.
    is_sphere = obj < num_s
    if num_s:
        s_idx = jnp.clip(obj, 0, num_s - 1)
        c = scene.sphere_center[s_idx]  # (P, 3)
        n_s = Vec3(point.x - c[:, 0], point.y - c[:, 1], point.z - c[:, 2])
        # Safe normalise (miss lanes may be degenerate):
        inv = 1.0 / jnp.sqrt(jnp.maximum(n_s.norm2(), 1e-20))
        n_s = n_s * inv
    else:
        n_s = Vec3.zeros(o.x.shape)
    if scene.disc_radius.shape[0]:
        d_idx = jnp.clip(obj - num_s, 0, scene.disc_radius.shape[0] - 1)
        nd = scene.disc_normal[d_idx]
        n_d = Vec3(nd[:, 0], nd[:, 1], nd[:, 2])
    else:
        n_d = Vec3.zeros(o.x.shape)
    normal = n_s.where(is_sphere, n_d)

    col = scene.colour[obj]
    emi = scene.emission[obj]
    return Hit(
        valid=valid,
        t=t,
        point=point,
        normal=normal,
        obj=obj,
        colour=Vec3(col[:, 0], col[:, 1], col[:, 2]),
        emission=Vec3(emi[:, 0], emi[:, 1], emi[:, 2]),
        emissive=scene.emissive[obj],
        material=scene.material[obj],
    )
