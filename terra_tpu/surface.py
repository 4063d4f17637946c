"""Differentiable shading-surface construction (wavefront-wide).

Replaces terra_surface_init (/root/reference/src/Terra.c:1726-1764). The
raycast (intersect.py / the BVH kernel) returns only discrete triangle ids
under stop_gradient; everything continuous — hit distance, position,
barycentrics, interpolated normal/uv, material attributes — is recomputed
here *differentiably* from the vertex buffer, so gradients flow to vertex
positions and material parameters without differentiating through the
discrete hit choice (SURVEY.md §7 hard part (b)).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from . import textures
from .ops import math3
from .scene import Scene, MAX_ATTRS

__all__ = ["Surface", "surface_init"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "point",
        "normal",
        "tangent",
        "bitangent",
        "uv",
        "attrs",
        "emissive",
        "mat_id",
        "bsdf_type",
        "ior",
        "t",
    ],
    meta_fields=[],
)
@dataclass
class Surface:
    """Batched TerraShadingSurface (Terra.h:36-44) + frame + material refs."""

    point: jax.Array  # (N, 3) world hit position (differentiable)
    normal: jax.Array  # (N, 3) interpolated shading normal
    tangent: jax.Array  # (N, 3)
    bitangent: jax.Array  # (N, 3)
    uv: jax.Array  # (N, 2) interpolated texcoord
    attrs: jax.Array  # (N, 8, 3) evaluated material attributes
    emissive: jax.Array  # (N, 3)
    mat_id: jax.Array  # (N,) i32
    bsdf_type: jax.Array  # (N,) i32
    ior: jax.Array  # (N,) f32
    t: jax.Array  # (N,) differentiable hit distance


def _eval_attribute(scene: Scene, const_val, tex_id, uv):
    """Constant-or-texture attribute closure (terra_attribute_eval,
    Terra.c:1804-1810): texture id >= 0 overrides the constant."""
    if scene.textures.num_textures == 0:
        return const_val
    safe_id = jnp.maximum(tex_id, 0)
    tex_val = textures.sample(scene.textures, safe_id, uv)
    return jnp.where((tex_id >= 0)[..., None], tex_val, const_val)


def surface_init(scene: Scene, o, d, tri_idx):
    """Build the Surface for lanes with (possibly invalid) triangle ids.

    o, d : (N, 3) the ray that produced the hit (origins already offset)
    tri_idx : (N,) i32 triangle ids (stop-gradient; callers mask misses)

    The hit distance is recomputed by differentiable ray/plane intersection
    against the chosen triangle, then barycentrics via the same 2x2 system
    as the reference (Terra.c:1728-1739). Corner weights: w_b = uv.x,
    w_c = uv.y, w_a = 1 - uv.x - uv.y (Terra.c:1741-1752).
    """
    geom = scene.geometry
    va = geom.positions[geom.tri_vidx[tri_idx, 0]]
    vb = geom.positions[geom.tri_vidx[tri_idx, 1]]
    vc = geom.positions[geom.tri_vidx[tri_idx, 2]]

    # Differentiable hit distance: t = ((a - o) . n_g) / (d . n_g)
    e0 = vb - va
    e1 = vc - va
    ng = math3.cross(e0, e1)
    denom = math3.dot(d, ng)
    safe = jnp.abs(denom) > 1e-12
    t = math3.dot(va - o, ng) / jnp.where(safe, denom, 1.0)
    t = jnp.where(safe, t, 0.0)
    point = o + t[..., None] * d

    # Barycentric uv via the reference's normal-equation solve.
    p = point - va
    d00 = math3.dot(e0, e0)
    d11 = math3.dot(e1, e1)
    d01 = math3.dot(e0, e1)
    dp0 = math3.dot(p, e0)
    dp1 = math3.dot(p, e1)
    div = d00 * d11 - d01 * d01
    inv_div = jnp.reciprocal(jnp.where(jnp.abs(div) > 1e-20, div, 1.0))
    wb = (d11 * dp0 - d01 * dp1) * inv_div
    wc = (d00 * dp1 - d01 * dp0) * inv_div
    wa = 1.0 - wb - wc

    n_corners = geom.normals[tri_idx]  # (N, 3corners, 3)
    normal = math3.normalize(
        wa[..., None] * n_corners[..., 0, :]
        + wb[..., None] * n_corners[..., 1, :]
        + wc[..., None] * n_corners[..., 2, :]
    )
    uv_corners = geom.uvs[tri_idx]  # (N, 3corners, 2)
    uv = (
        wa[..., None] * uv_corners[..., 0, :]
        + wb[..., None] * uv_corners[..., 1, :]
        + wc[..., None] * uv_corners[..., 2, :]
    )

    mat_id = geom.mat_id[tri_idx]
    mats = scene.materials
    # Attributes: 8 slots, constant or texture (Terra.c:1758-1760).
    const_attrs = mats.attrs[mat_id]  # (N, 8, 3)
    if scene.textures.num_textures > 0:
        slots = []
        for s in range(MAX_ATTRS):
            slots.append(
                _eval_attribute(scene, const_attrs[:, s, :], mats.attr_tex[mat_id, s], uv)
            )
        attrs = jnp.stack(slots, axis=-2)
    else:
        attrs = const_attrs
    emissive = _eval_attribute(scene, mats.emissive[mat_id], mats.emissive_tex[mat_id], uv)

    tangent, bitangent = math3.build_basis(normal)
    return Surface(
        point=point,
        normal=normal,
        tangent=tangent,
        bitangent=bitangent,
        uv=uv,
        attrs=attrs,
        emissive=emissive,
        mat_id=mat_id,
        bsdf_type=mats.bsdf_type[mat_id],
        ior=mats.ior[mat_id],
        t=t,
    )
