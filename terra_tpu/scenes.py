"""Programmatic test scenes (the reference ships data scenes; tests here
build the classic Cornell box in code, SURVEY.md §7 step 1)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .scene import (
    ATTR,
    Accelerator,
    BSDFType,
    Camera,
    Geometry,
    MaterialTable,
    Scene,
    commit,
)

__all__ = ["cornell_box", "cornell_camera", "random_triangles", "courtyard", "courtyard_camera"]


def _quad(v0, v1, v2, v3):
    """Two CCW triangles for the quad v0..v3."""
    return [(v0, v1, v2), (v0, v2, v3)]


def make_geometry(tri_list, mat_ids, obj_ids=None) -> Geometry:
    """Build a Geometry from a python list of ((a, b, c) corner) triples.
    Shading normals are the (flat) geometric normals; uvs cover [0,1]."""
    tris = np.asarray(tri_list, np.float32)  # (T, 3, 3)
    t = tris.shape[0]
    positions = tris.reshape(t * 3, 3)
    tri_vidx = np.arange(t * 3, dtype=np.int32).reshape(t, 3)
    e0 = tris[:, 1] - tris[:, 0]
    e1 = tris[:, 2] - tris[:, 0]
    n = np.cross(e0, e1)
    n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    normals = np.repeat(n[:, None, :], 3, axis=1).astype(np.float32)
    uvs = np.tile(
        np.asarray([[0, 0], [1, 0], [1, 1]], np.float32)[None], (t, 1, 1)
    )
    if obj_ids is None:
        obj_ids = np.zeros(t, np.int32)
    return Geometry(
        positions=jnp.asarray(positions),
        tri_vidx=jnp.asarray(tri_vidx),
        normals=jnp.asarray(normals),
        uvs=jnp.asarray(uvs),
        mat_id=jnp.asarray(np.asarray(mat_ids, np.int32)),
        obj_id=jnp.asarray(np.asarray(obj_ids, np.int32)),
    )


def cornell_box(
    accelerator: Accelerator = Accelerator.BRUTE,
    light_emission: float = 15.0,
    with_blocks: bool = True,
    wall_bsdf: BSDFType = BSDFType.DIFFUSE,
    block_bsdf: BSDFType = BSDFType.DIFFUSE,
    block_ior: float = 1.5,
    env_value=(0.0, 0.0, 0.0),
) -> Scene:
    """Classic Cornell box, left-handed Y-up, in a 0..556-ish unit cube
    (the standard Cornell dataset scaled as-is; camera looks down +Z).

    Materials: 0 white diffuse, 1 red, 2 green, 3 light (white + emissive).
    ``wall_bsdf`` switches the neutral walls to PHONG/GGX for the specular
    benchmark config (BASELINE.md config 2). ``block_bsdf`` switches the
    short block's material (e.g. GLASS with ``block_ior`` for the dielectric
    transmission tests — the reference's disabled glass preset,
    TerraPresets.c:397-465).
    """
    W = 556.0  # box width
    H = 548.8
    D = 559.2
    tris = []
    mids = []
    oids = []

    def add(quad, mid, oid):
        for tri in quad:
            tris.append(tri)
            mids.append(mid)
            oids.append(oid)

    # floor (y=0), ceiling, back wall (z=D), right (x=0, green), left (x=W, red)
    add(_quad((W, 0, 0), (0, 0, 0), (0, 0, D), (W, 0, D)), 0, 0)  # floor
    add(_quad((W, H, 0), (W, H, D), (0, H, D), (0, H, 0)), 0, 1)  # ceiling
    add(_quad((W, 0, D), (0, 0, D), (0, H, D), (W, H, D)), 0, 2)  # back
    add(_quad((0, 0, D), (0, 0, 0), (0, H, 0), (0, H, D)), 2, 3)  # right green
    add(_quad((W, 0, 0), (W, 0, D), (W, H, D), (W, H, 0)), 1, 4)  # left red

    # light quad slightly below the ceiling
    lx0, lx1 = 213.0, 343.0
    lz0, lz1 = 227.0, 332.0
    ly = H - 0.5
    add(_quad((lx1, ly, lz0), (lx1, ly, lz1), (lx0, ly, lz1), (lx0, ly, lz0)), 3, 5)

    if with_blocks:
        # short block
        def box(corners_bottom, height, mid, oid):
            b = [np.asarray(c, np.float32) for c in corners_bottom]
            t = [c + np.asarray([0, height, 0], np.float32) for c in b]
            add(_quad(t[0], t[1], t[2], t[3]), mid, oid)  # top
            for i in range(4):
                j = (i + 1) % 4
                add(_quad(b[i], b[j], t[j], t[i]), mid, oid)

        short_mid = 4 if block_bsdf != BSDFType.DIFFUSE else 0
        box([(130, 0, 65), (82, 0, 225), (240, 0, 272), (290, 0, 114)], 165.0, short_mid, 6)
        box([(423, 0, 247), (265, 0, 296), (314, 0, 456), (472, 0, 406)], 330.0, 0, 7)

    geom = make_geometry(tris, mids, oids)

    m = 5 if (with_blocks and block_bsdf != BSDFType.DIFFUSE) else 4
    attrs = np.zeros((m, 8, 3), np.float32)
    # white walls
    attrs[0, ATTR.DIFFUSE_ALBEDO] = (0.73, 0.73, 0.73)
    attrs[1, ATTR.DIFFUSE_ALBEDO] = (0.61, 0.06, 0.06)
    attrs[2, ATTR.DIFFUSE_ALBEDO] = (0.12, 0.47, 0.1)
    attrs[3, ATTR.DIFFUSE_ALBEDO] = (0.78, 0.78, 0.78)
    bsdf_types = np.zeros(m, np.int32)
    if wall_bsdf == BSDFType.PHONG:
        bsdf_types[0] = BSDFType.PHONG
        attrs[0, ATTR.PHONG_SPECULAR_COLOR] = (0.4, 0.4, 0.4)
        attrs[0, ATTR.PHONG_SPECULAR_INTENSITY] = (32.0, 0.0, 0.0)
    elif wall_bsdf == BSDFType.GGX:
        bsdf_types[0] = BSDFType.GGX
        attrs[0, ATTR.GGX_ROUGHNESS] = (0.25, 0.0, 0.0)
        attrs[0, ATTR.GGX_METALNESS] = (0.3, 0.0, 0.0)
    if m == 5:
        bsdf_types[4] = block_bsdf
        if block_bsdf == BSDFType.GLASS:
            attrs[4, ATTR.GLASS_COLOR] = (1.0, 1.0, 1.0)
        elif block_bsdf == BSDFType.MIRROR:
            attrs[4, ATTR.MIRROR_COLOR] = (0.95, 0.95, 0.95)
        else:
            attrs[4, ATTR.DIFFUSE_ALBEDO] = (0.73, 0.73, 0.73)
    emissive = np.zeros((m, 3), np.float32)
    emissive[3] = (light_emission, light_emission, light_emission)
    iors = np.full((m,), 1.5, np.float32)
    if m == 5:
        iors[4] = block_ior

    materials = MaterialTable(
        bsdf_type=jnp.asarray(bsdf_types),
        attrs=jnp.asarray(attrs),
        attr_tex=jnp.full((m, 8), -1, jnp.int32),
        emissive=jnp.asarray(emissive),
        emissive_tex=jnp.full((m,), -1, jnp.int32),
        ior=jnp.asarray(iors),
    )
    return commit(geom, materials, accelerator=accelerator, env_value=env_value)


def cornell_camera() -> Camera:
    """Camera at the open face looking down +Z (left-handed)."""
    return Camera.make(
        position=(278.0, 273.0, -800.0),
        direction=(0.0, 0.0, 1.0),
        up=(0.0, 1.0, 0.0),
        fov_deg=39.3,
    )


def courtyard(
    grid: int = 300,
    columns: int = 40,
    column_segments: int = 48,
    column_levels: int = 16,
    accelerator: Accelerator = Accelerator.BVH,
    textured: bool = True,
    tex_res: int = 128,
) -> Scene:
    """Sponza-class procedural stress scene (~250k tris at defaults):
    a displaced-terrain courtyard floor, a colonnade of fluted columns, a
    surrounding wall, and two area lights. Used for the BASELINE config-3
    benchmark (textured ~250k-tri mesh with LBVH build + traversal) since
    the environment has no scene assets.
    """
    from .scene import TextureAtlas
    import jax.numpy as _jnp

    rng = np.random.default_rng(7)
    # batched (T,3,3)/(T,3,2)/(T,)/(T,) blocks, concatenated at the end —
    # fully vectorized (the per-triangle python loop version took ~5s at
    # the default 242k tris; this builds in ~80ms)
    blocks = []  # (tris, uvs, mid, oid)

    def emit_quads(p00, p10, p11, p01, uv00, uv10, uv11, uv01, mid, oid):
        """Two CCW triangles per quad, interleaved in input order.
        p??: (..., 3); uv??: (..., 2); oid: scalar or (...) array."""
        t1 = np.stack([p00, p10, p11], axis=-2)
        t2 = np.stack([p00, p11, p01], axis=-2)
        tris = np.stack([t1, t2], axis=-3).reshape(-1, 3, 3)
        u1 = np.stack([uv00, uv10, uv11], axis=-2)
        u2 = np.stack([uv00, uv11, uv01], axis=-2)
        uvs = np.stack([u1, u2], axis=-3).reshape(-1, 3, 2)
        n = tris.shape[0]
        oid_a = np.broadcast_to(np.asarray(oid), p00.shape[:-1])
        oid_a = np.stack([oid_a, oid_a], axis=-1).reshape(-1)
        blocks.append((tris.astype(np.float32), uvs.astype(np.float32),
                       np.full(n, mid, np.int32), oid_a.astype(np.int32)))

    # displaced terrain floor: grid x grid quads over [0, 40]^2
    size = 40.0
    xs = np.linspace(0, size, grid + 1)
    zs = np.linspace(0, size, grid + 1)
    hx = np.sin(xs[:, None] * 0.7) * 0.25 + np.cos(zs[None, :] * 0.9) * 0.25
    hx += rng.normal(0, 0.02, hx.shape)
    I, J = np.meshgrid(np.arange(grid), np.arange(grid), indexing="ij")

    def tp(ii, jj):
        return np.stack([xs[ii], hx[ii, jj], zs[jj]], axis=-1)

    def tuv(ii, jj):
        return np.stack([ii / 8 % 1, jj / 8 % 1], axis=-1)

    emit_quads(tp(I, J), tp(I + 1, J), tp(I + 1, J + 1), tp(I, J + 1),
               tuv(I, J), tuv(I + 1, J), tuv(I + 1, J + 1), tuv(I, J + 1),
               0, 0)

    # colonnade: fluted columns around the courtyard (axes K x LV x S)
    height = 8.0
    segs, levels = column_segments, column_levels
    k = np.arange(columns)[:, None, None]
    lv = np.arange(levels)[None, :, None]
    s = np.arange(segs)[None, None, :]
    ang = 2 * np.pi * k / columns
    cx = size / 2 + np.cos(ang) * size * 0.35
    cz = size / 2 + np.sin(ang) * size * 0.35
    radius = 0.8 + 0.1 * np.sin(5 * ang)

    def cy(lvv):
        return np.broadcast_to(lvv * height / levels, (columns, levels, segs)).astype(np.float64)

    def cr(lvv):
        return radius * (1.0 + 0.08 * np.sin(lvv * 1.3))

    def ca(ss):
        a = 2 * np.pi * ss / segs
        return a, 1 + 0.06 * np.sin(a * 9)

    def cpt(lvv, ss):
        a, flute = ca(ss)
        r = cr(lvv)
        return np.stack(np.broadcast_arrays(
            cx + np.cos(a) * r * flute, cy(lvv), cz + np.sin(a) * r * flute
        ), axis=-1)

    def cuv(lvv, ss):
        return np.stack(np.broadcast_arrays(
            ss / segs + 0.0 * (cx + cr(lvv)), lvv / levels + 0.0 * cx
        ), axis=-1)

    emit_quads(cpt(lv, s), cpt(lv, s + 1), cpt(lv + 1, s + 1), cpt(lv + 1, s),
               cuv(lv, s), cuv(lv, s + 1), cuv(lv + 1, s + 1), cuv(lv + 1, s),
               1, 1 + np.broadcast_to(k, (columns, levels, segs)))

    oid = 1 + columns
    # surrounding walls
    wall_h = 12.0
    for (a, b) in [((0, 0), (size, 0)), ((size, 0), (size, size)), ((size, size), (0, size)), ((0, size), (0, 0))]:
        steps = 40
        t0 = np.arange(steps) / steps
        t1 = (np.arange(steps) + 1) / steps

        def wp(t, y):
            return np.stack([a[0] + (b[0] - a[0]) * t, np.full_like(t, y),
                             a[1] + (b[1] - a[1]) * t], axis=-1)

        uvd = np.stack([np.zeros(steps), np.zeros(steps)], axis=-1)
        uvb = np.stack([np.ones(steps), np.zeros(steps)], axis=-1)
        uvc = np.stack([np.ones(steps), np.ones(steps)], axis=-1)
        emit_quads(wp(t0, 0.0), wp(t1, 0.0), wp(t1, wall_h), wp(t0, wall_h),
                   uvd, uvb, uvc, uvd, 2, oid)
        oid += 1

    # two area lights high above the courtyard
    for lx, lz in [(size * 0.3, size * 0.3), (size * 0.7, size * 0.7)]:
        sl = 2.0
        y = 14.0
        c00 = np.asarray([[lx - sl, y, lz - sl]])
        c10 = np.asarray([[lx + sl, y, lz - sl]])
        c11 = np.asarray([[lx + sl, y, lz + sl]])
        c01 = np.asarray([[lx - sl, y, lz + sl]])
        uv = np.asarray([[0.0, 0.0]])
        emit_quads(c00, c10, c11, c01, uv, uv, uv, uv, 3, oid)
        oid += 1

    tris_a = np.concatenate([b[0] for b in blocks])
    uvs_a = np.concatenate([b[1] for b in blocks])
    mids_a = np.concatenate([b[2] for b in blocks])
    oids_a = np.concatenate([b[3] for b in blocks])
    t = tris_a.shape[0]
    e0 = tris_a[:, 1] - tris_a[:, 0]
    e1 = tris_a[:, 2] - tris_a[:, 0]
    n = np.cross(e0, e1)
    n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    geom = Geometry(
        positions=jnp.asarray(tris_a.reshape(t * 3, 3)),
        tri_vidx=jnp.asarray(np.arange(t * 3, dtype=np.int32).reshape(t, 3)),
        normals=jnp.asarray(np.repeat(n[:, None, :], 3, axis=1).astype(np.float32)),
        uvs=jnp.asarray(uvs_a),
        mat_id=jnp.asarray(mids_a),
        obj_id=jnp.asarray(oids_a),
    )

    m = 4
    attrs = np.zeros((m, 8, 3), np.float32)
    attrs[0, ATTR.DIFFUSE_ALBEDO] = (0.55, 0.5, 0.45)   # terrain
    attrs[1, ATTR.GGX_ALBEDO] = (0.7, 0.65, 0.6)         # columns (ggx)
    attrs[1, ATTR.GGX_ROUGHNESS] = (0.4, 0, 0)
    attrs[1, ATTR.GGX_METALNESS] = (0.1, 0, 0)
    attrs[2, ATTR.DIFFUSE_ALBEDO] = (0.35, 0.35, 0.4)    # walls
    attrs[3, ATTR.DIFFUSE_ALBEDO] = (0.8, 0.8, 0.8)      # light
    emissive = np.zeros((m, 3), np.float32)
    emissive[3] = (40.0, 38.0, 34.0)
    attr_tex = np.full((m, 8), -1, np.int32)

    atlas = None
    if textured:
        # procedural checker + marble-ish noise textures. ``tex_res``
        # scales them up (default 128 keeps the benchmark scene pinned;
        # 1024+ exercises the texture system at production sizes —
        # VERDICT r4 weak #7).
        res = tex_res
        yy, xx = np.mgrid[0:res, 0:res] / res
        checker = ((np.floor(xx * 8) + np.floor(yy * 8)) % 2)[..., None]
        tex0 = (0.35 + 0.5 * checker * np.ones((1, 1, 3))).astype(np.float32)
        marble = (0.5 + 0.5 * np.sin(xx * 20 + 4 * np.sin(yy * 7)))[..., None]
        tex1 = (np.asarray([0.75, 0.7, 0.62]) * (0.6 + 0.4 * marble)).astype(np.float32)
        data = np.stack([tex0, tex1]).astype(np.float32)
        atlas = TextureAtlas(
            data=_jnp.asarray(data),
            size=_jnp.asarray(np.asarray([[res, res], [res, res]], np.int32)),
            filter=_jnp.asarray(np.asarray([1, 1], np.int32)),
            address=_jnp.asarray(np.asarray([0, 0], np.int32)),
        )
        attr_tex[0, ATTR.DIFFUSE_ALBEDO] = 0
        attr_tex[1, ATTR.GGX_ALBEDO] = 1

    materials = MaterialTable(
        bsdf_type=jnp.asarray(np.asarray([0, 2, 0, 0], np.int32)),
        attrs=jnp.asarray(attrs),
        attr_tex=jnp.asarray(attr_tex),
        emissive=jnp.asarray(emissive),
        emissive_tex=jnp.full((m,), -1, jnp.int32),
        ior=jnp.full((m,), 1.5, jnp.float32),
    )
    return commit(geom, materials, textures=atlas, accelerator=accelerator)


def courtyard_camera() -> Camera:
    return Camera.make(
        position=(20.0, 4.0, 3.0),
        direction=(0.0, 0.08, 1.0),
        up=(0.0, 1.0, 0.0),
        fov_deg=60.0,
    )


def random_triangles(n: int, seed: int = 0, scale: float = 1.0, accelerator=Accelerator.BRUTE) -> Scene:
    """Random triangle soup for intersection/BVH stress tests."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-scale, scale, (n, 1, 3)).astype(np.float32)
    offsets = rng.uniform(-0.1 * scale, 0.1 * scale, (n, 3, 3)).astype(np.float32)
    tris = centers + offsets
    geom = make_geometry(list(tris), np.zeros(n, np.int32), np.zeros(n, np.int32))
    materials = MaterialTable(
        bsdf_type=jnp.zeros((1,), jnp.int32),
        attrs=jnp.full((1, 8, 3), 0.5, jnp.float32),
        attr_tex=jnp.full((1, 8), -1, jnp.int32),
        emissive=jnp.zeros((1, 3), jnp.float32),
        emissive_tex=jnp.full((1,), -1, jnp.int32),
        ior=jnp.full((1,), 1.5, jnp.float32),
    )
    return commit(geom, materials, accelerator=accelerator)
