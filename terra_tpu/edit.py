"""Scene editing: object-level transforms with cheap re-commit.

Parity with the Satellite ``mesh list`` / ``mesh move`` commands
(/root/reference/satellite/src/App.cpp:519-578, Scene.cpp:271-321): the
reference tags moved vertices by generation and then rebuilds the whole
scene + BVH. Here an object move is a pure vertex-buffer update; the BVH is
*refit* (topology unchanged) instead of rebuilt, and the light table is
rebuilt only if the object carries emissive triangles.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from .scene import Scene, build_light_table
from .accel import lbvh

__all__ = ["list_objects", "move_object", "transform_object"]


def list_objects(scene: Scene) -> List[Dict]:
    """Object inventory: id, triangle count, bbox (the console's
    ``mesh list``, App.cpp:519-530)."""
    obj = np.asarray(scene.geometry.obj_id)
    vidx = np.asarray(scene.geometry.tri_vidx)
    pos = np.asarray(scene.geometry.positions)
    out = []
    for oid in np.unique(obj):
        tris = np.nonzero(obj == oid)[0]
        verts = np.unique(vidx[tris].reshape(-1))
        p = pos[verts]
        out.append(
            dict(
                object_id=int(oid),
                triangles=int(len(tris)),
                bbox_min=p.min(axis=0).tolist(),
                bbox_max=p.max(axis=0).tolist(),
            )
        )
    return out


def _object_vertex_mask(scene: Scene, object_id: int):
    obj = np.asarray(scene.geometry.obj_id)
    vidx = np.asarray(scene.geometry.tri_vidx)
    verts = np.unique(vidx[obj == object_id].reshape(-1))
    mask = np.zeros(scene.geometry.positions.shape[0], bool)
    mask[verts] = True
    return jnp.asarray(mask)


def transform_object(scene: Scene, object_id: int, fn) -> Scene:
    """Apply ``fn(positions) -> positions`` to the vertices of one object,
    refit the BVH, and rebuild the light table if needed."""
    mask = _object_vertex_mask(scene, object_id)
    pos = scene.geometry.positions
    new_pos = jnp.where(mask[:, None], fn(pos), pos)
    geom = dataclasses.replace(scene.geometry, positions=new_pos)
    bvh = lbvh.refit(scene.bvh, geom) if scene.bvh is not None else None
    # light areas/cdf change if the moved object is emissive (scaling) —
    # rebuilding the table is cheap and always correct.
    lights = build_light_table(geom, scene.materials, capacity=scene.lights.tri_idx.shape[0])
    return dataclasses.replace(scene, geometry=geom, bvh=bvh, lights=lights)


def move_object(scene: Scene, object_id: int, delta) -> Scene:
    """Translate an object (``mesh move x y z``, App.cpp:532-552)."""
    delta = jnp.asarray(delta, jnp.float32)
    return transform_object(scene, object_id, lambda p: p + delta)
