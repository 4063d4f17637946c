"""Tests for distributions, scene editing, native kernels, Disney BRDF."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import terra_tpu as tt
from terra_tpu import edit
from terra_tpu.ops import distributions as dist


# ------------------------------------------------------------ distributions

def test_distribution_1d_statistics():
    f = jnp.asarray([1.0, 3.0, 0.0, 4.0])
    d = dist.build_1d(f)
    np.testing.assert_allclose(float(d.integral), 8.0)
    e = jnp.linspace(0.001, 0.999, 4096)
    x, pdf, idx = dist.sample_1d(d, e)
    counts = np.bincount(np.asarray(idx), minlength=4) / 4096
    np.testing.assert_allclose(counts, [1 / 8, 3 / 8, 0, 4 / 8], atol=0.01)
    assert (np.asarray(x) >= 0).all() and (np.asarray(x) < 1).all()
    # pdf at sampled buckets matches f/integral
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(d.f)[np.asarray(idx)] / 8.0)


def test_distribution_2d_marginals():
    f = jnp.asarray([[1.0, 1.0], [0.0, 2.0]])
    d2 = dist.build_2d(f)
    e = jnp.linspace(0.01, 0.99, 2048)
    (u, v), pdf = dist.sample_2d(d2, e, jnp.flip(e))
    v = np.asarray(v)
    # marginal over rows: row0 weight 2/4, row1 weight 2/4
    assert abs((v < 0.5).mean() - 0.5) < 0.03
    assert np.isfinite(np.asarray(pdf)).all()


# ------------------------------------------------------------------ editing

def test_list_and_move_object():
    scene = tt.scenes.cornell_box(accelerator=tt.Accelerator.BVH)
    objs = edit.list_objects(scene)
    assert len(objs) == 8  # walls x5, light, two blocks
    # move the short block upward; scene stays consistent
    moved = edit.move_object(scene, 6, (0.0, 50.0, 0.0))
    assert float(jnp.max(jnp.abs(moved.geometry.positions - scene.geometry.positions))) == 50.0
    # render still works and differs from the original
    cam = tt.scenes.cornell_camera()
    opts = tt.RenderOptions(width=12, height=12, samples_per_pixel=4, bounces=1,
                            integrator=tt.Integrator.DIRECT, accelerator=tt.Accelerator.BVH)
    img0 = np.asarray(tt.render(scene, cam, opts, seed=1).mean())
    img1 = np.asarray(tt.render(moved, cam, opts, seed=1).mean())
    assert np.isfinite(img1).all()
    assert np.abs(img0 - img1).max() > 1e-3


def test_move_light_rebuilds_light_table():
    scene = tt.scenes.cornell_box()
    scaled = edit.transform_object(scene, 5, lambda p: p * jnp.asarray([2.0, 1.0, 2.0]))
    # light triangles grew -> areas in the table must grow
    assert float(jnp.sum(scaled.lights.area)) > float(jnp.sum(scene.lights.area)) * 1.5


# ------------------------------------------------------------------- native

def test_native_lbvh_matches_numpy_fallback():
    from terra_tpu import native
    from terra_tpu.accel import lbvh

    if not native.available():
        pytest.skip("no native toolchain")
    scene = tt.scenes.random_triangles(777, seed=4)
    geom = scene.geometry
    import os

    os.environ["TERRA_TPU_NO_NATIVE"] = "1"
    try:
        native._tried = False
        native._lib = None
        bvh_np = lbvh.build(geom)
    finally:
        del os.environ["TERRA_TPU_NO_NATIVE"]
        native._tried = False
        native._lib = None
    bvh_nat = lbvh.build(geom, builder="lbvh")
    assert bvh_nat.num_leaves == bvh_np.num_leaves
    # same triangles covered; same leaf partitioning (both morton-sorted)
    np.testing.assert_array_equal(
        np.sort(np.asarray(bvh_nat.leaf_tri).reshape(-1)),
        np.sort(np.asarray(bvh_np.leaf_tri).reshape(-1)),
    )


def test_native_sah_build_validity():
    """SAH builder (default): every triangle reachable, leaves at least
    half full, child boxes contained in parents."""
    from terra_tpu import native
    from terra_tpu.accel import lbvh

    if not native.available():
        pytest.skip("no native toolchain")
    scene = tt.scenes.random_triangles(777, seed=4)
    bvh = lbvh.build(scene.geometry, builder="sah")
    t = scene.geometry.tri_vidx.shape[0]
    leaf_tri = np.asarray(bvh.leaf_tri)
    assert set(np.unique(leaf_tri)) == set(range(t))
    assert bvh.num_leaves <= 2 * ((t + bvh.leaf_size - 1) // bvh.leaf_size)
    ni = bvh.num_internal
    bmin = np.asarray(bvh.node_min)
    bmax = np.asarray(bvh.node_max)
    left = np.asarray(bvh.node_left)
    right = np.asarray(bvh.node_right)
    for ch in (left, right):
        assert (bmin[:ni] <= bmin[ch] + 1e-5).all()
        assert (bmax[:ni] >= bmax[ch] - 1e-5).all()
    # traversal with the SAH tree agrees with brute force
    from terra_tpu.accel import traverse
    from terra_tpu import intersect

    rng = np.random.default_rng(1)
    o = jnp.asarray(rng.uniform(-2, 2, (512, 3)).astype(np.float32))
    d_ = rng.normal(size=(512, 3)).astype(np.float32)
    d = jnp.asarray(d_ / np.linalg.norm(d_, axis=-1, keepdims=True))
    ta, tb, tc = scene.geometry.corners()
    ref = intersect.raycast_brute(o, d, ta, tb, tc)
    s = dataclasses.replace(scene, bvh=bvh)
    hit = traverse.raycast(s, o, d)
    np.testing.assert_array_equal(np.asarray(hit.hit), np.asarray(ref.hit))


def test_render_options_default_accelerator_is_bvh():
    """Regression guard: RenderOptions must default to BVH like the config
    registry. A BRUTE default silently dense-swept BVH scenes from every
    API-constructed option set (courtyard 384^2 render: 35 s vs 1.8 s)."""
    from terra_tpu.config import Config

    opts = tt.RenderOptions()
    assert opts.accelerator == tt.Accelerator.BVH
    assert Config().get("render_accelerator") == tt.Accelerator.BVH


def test_native_obj_parse():
    from terra_tpu import native

    if not native.available():
        pytest.skip("no native toolchain")
    text = b"""
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vn 0 0 1
vt 0.5 0.5
f 1/1/1 2/1/1 3/1/1 4/1/1
f -1 -2 -3
"""
    out = native.obj_parse(text)
    assert out is not None
    verts, norms, uvs, face_idx, face_line = out
    assert verts.shape == (4, 3) and norms.shape == (1, 3) and uvs.shape == (1, 2)
    assert face_idx.shape == (3, 3, 3)  # quad fans to 2 + 1 tri
    np.testing.assert_array_equal(face_idx[0, :, 0], [0, 1, 2])
    np.testing.assert_array_equal(face_idx[2, :, 0], [3, 2, 1])  # negative idx
    assert face_idx[2, 0, 1] == -1  # no vt on the second face


# ------------------------------------------------------------------- disney

def test_disney_eval_behaves():
    scene = tt.scenes.cornell_box()
    # retag material 0 as disney with plausible params
    attrs = np.asarray(scene.materials.attrs).copy()
    attrs[0, tt.ATTR.DISNEY_BASE_COLOR] = (0.8, 0.4, 0.2)
    attrs[0, tt.ATTR.DISNEY_METAL_ROUGH] = (0.3, 0.4, 0.0)
    attrs[0, tt.ATTR.DISNEY_SHEEN] = (0.5, 0.5, 0.0)
    attrs[0, tt.ATTR.DISNEY_CLEARCOAT] = (0.5, 0.7, 0.0)
    bt = np.asarray(scene.materials.bsdf_type).copy()
    bt[0] = int(tt.BSDFType.DISNEY)
    mats = dataclasses.replace(
        scene.materials,
        attrs=jnp.asarray(attrs),
        bsdf_type=jnp.asarray(bt),
        types_present=(0, 4),
    )
    scene = dataclasses.replace(scene, materials=mats)
    cam = tt.scenes.cornell_camera()
    opts = tt.RenderOptions(width=12, height=12, samples_per_pixel=8, bounces=2,
                            integrator=tt.Integrator.DIRECT)
    img = np.asarray(tt.render(scene, cam, opts, seed=3).mean())
    assert np.isfinite(img).all()
    assert img.mean() > 0.001


def test_disney_eval_reciprocal_positive():
    """f(wi,wo) >= 0 and zero below the horizon."""
    from terra_tpu import bsdf
    from terra_tpu.surface import Surface

    n = 128
    rng = np.random.default_rng(0)
    normal = jnp.asarray(np.tile([[0.0, 1.0, 0.0]], (n, 1)).astype(np.float32))
    from terra_tpu.ops import math3

    tangent, bitangent = math3.build_basis(normal)
    attrs = np.zeros((n, 8, 3), np.float32)
    attrs[:, 0] = (0.5, 0.5, 0.5)
    attrs[:, 4] = (0.2, 0.5, 0.0)
    surf = Surface(
        point=jnp.zeros((n, 3)), normal=normal, tangent=tangent, bitangent=bitangent,
        uv=jnp.zeros((n, 2)), attrs=jnp.asarray(attrs), emissive=jnp.zeros((n, 3)),
        mat_id=jnp.zeros((n,), jnp.int32), bsdf_type=jnp.full((n,), 4, jnp.int32),
        ior=jnp.full((n,), 1.5), t=jnp.ones((n,)),
        obj_id=jnp.zeros((n,), jnp.int32), tri_area=jnp.ones((n,)),
    )
    wi_ = rng.normal(size=(n, 3)).astype(np.float32)
    wi_[:, 1] = np.abs(wi_[:, 1]) + 0.1
    wi = jnp.asarray(wi_ / np.linalg.norm(wi_, axis=-1, keepdims=True))
    wo = jnp.asarray(np.tile([[0.3, 0.8, 0.1]], (n, 1)) / np.linalg.norm([0.3, 0.8, 0.1]))
    f = np.asarray(bsdf.eval_f(surf, wi, wo, present=(4,)))
    assert np.isfinite(f).all() and (f >= 0).all()
    f_below = np.asarray(bsdf.eval_f(surf, -wi, wo, present=(4,)))
    np.testing.assert_allclose(f_below, 0.0)


def test_texture_flat_gather_matches_direct_3d():
    """textures._read's flat 1D-index fetch (round-5 perf form) must return
    the same texels as the direct 3D gather for a MIXED atlas: different
    texture sizes inside one padded array and all three address modes."""
    import jax.numpy as jnp

    from terra_tpu import textures
    from terra_tpu.scene import TextureAtlas

    rng = np.random.default_rng(9)
    H = W = 16
    data = rng.random((3, H, W, 3)).astype(np.float32)
    atlas = TextureAtlas(
        data=jnp.asarray(data),
        # texture 1 is SMALLER than the padded array (8x12): its wrap/
        # mirror/clamp arithmetic must index inside its own extent
        size=jnp.asarray([[16, 16], [8, 12], [16, 16]], np.int32),
        filter=jnp.asarray([1, 1, 0], np.int32),
        address=jnp.asarray(
            [textures.ADDR_WRAP, textures.ADDR_MIRROR, textures.ADDR_CLAMP],
            np.int32),
    )
    n = 4096
    tex_id = jnp.asarray(rng.integers(0, 3, n).astype(np.int32))
    # uvs beyond [0,1] exercise the address modes
    uv = jnp.asarray((rng.random((n, 2)) * 3.0 - 1.0).astype(np.float32))
    got = np.asarray(textures.sample(atlas, tex_id, uv))

    # independent direct 3D-indexed reference of the same bilinear math
    def read_ref(x, y):
        h = np.asarray(atlas.size)[np.asarray(tex_id), 0]
        w = np.asarray(atlas.size)[np.asarray(tex_id), 1]
        mode = np.asarray(atlas.address)[np.asarray(tex_id)]
        def addr(c, s):
            wrap = np.remainder(c, s)
            m = np.remainder(c, 2 * s)
            mirror = np.where(m >= s, 2 * s - 1 - m, m)
            clamp = np.clip(c, 0, s - 1)
            return np.where(mode == textures.ADDR_WRAP, wrap,
                            np.where(mode == textures.ADDR_MIRROR, mirror,
                                     clamp))
        return data[np.asarray(tex_id), addr(y, h), addr(x, w)]

    h = np.asarray(atlas.size)[np.asarray(tex_id), 0].astype(np.float32)
    w = np.asarray(atlas.size)[np.asarray(tex_id), 1].astype(np.float32)
    fx = np.asarray(uv)[:, 0] * w
    fy = np.asarray(uv)[:, 1] * h
    ix = np.floor(fx).astype(np.int32)
    iy = np.floor(fy).astype(np.int32)
    n1 = read_ref(ix, iy)
    n2 = read_ref(ix + 1, iy)
    n3 = read_ref(ix, iy + 1)
    n4 = read_ref(ix + 1, iy + 1)
    wu = (fx - ix)[:, None]
    wv = (fy - iy)[:, None]
    bilinear = (n1 * (1 - wu) + n2 * wu) * (1 - wv) + (
        n3 * (1 - wu) + n4 * wu) * wv
    expect = np.where(
        (np.asarray(atlas.filter)[np.asarray(tex_id)] == 1)[:, None],
        bilinear, n1)
    np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-6)
