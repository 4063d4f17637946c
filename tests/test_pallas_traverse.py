"""Pallas traversal kernel: interpret-mode correctness vs brute force.

On the CPU test mesh the kernel runs through the Pallas interpreter (the
compiled path is exercised on real TPU hardware by bench/driver runs).
"""
import numpy as np
import jax.numpy as jnp
import pytest

import terra_tpu as tt
from terra_tpu import intersect
from terra_tpu.accel import pallas_traverse


@pytest.mark.parametrize("tris", [33, 700, 3000])
def test_pallas_matches_brute(tris):
    scene = tt.scenes.random_triangles(tris, seed=tris, accelerator=tt.Accelerator.BVH)
    rng = np.random.default_rng(1)
    n = 2048
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d_ = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d_ / np.linalg.norm(d_, axis=-1, keepdims=True))
    hit_p = pallas_traverse.raycast(scene, o, d, interpret=True)
    ta, tb, tc = scene.geometry.corners()
    hit_r = intersect.raycast_brute(o, d, ta, tb, tc)
    h1 = np.asarray(hit_p.hit)
    h2 = np.asarray(hit_r.hit)
    np.testing.assert_array_equal(h1, h2)
    both = h1 & h2
    np.testing.assert_allclose(
        np.asarray(hit_p.t)[both], np.asarray(hit_r.t)[both], rtol=1e-4
    )
    same_tri = np.asarray(hit_p.tri)[both] == np.asarray(hit_r.tri)[both]
    assert same_tri.mean() > 0.99  # fp ties on shared edges may differ


def test_pallas_unsorted_matches_sorted():
    scene = tt.scenes.random_triangles(500, seed=9, accelerator=tt.Accelerator.BVH)
    rng = np.random.default_rng(2)
    o = jnp.asarray(rng.uniform(-2, 2, (2048, 3)).astype(np.float32))
    d_ = rng.normal(size=(2048, 3)).astype(np.float32)
    d = jnp.asarray(d_ / np.linalg.norm(d_, axis=-1, keepdims=True))
    a = pallas_traverse.raycast(scene, o, d, sort_rays=True, interpret=True)
    b = pallas_traverse.raycast(scene, o, d, sort_rays=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t), rtol=1e-5)


def test_pallas_occlusion_query_matches_brute():
    """Ranged occlusion (t_max seeds best-t): hit means occluded strictly
    within t_max, matching the brute closest-hit comparison."""
    scene = tt.scenes.random_triangles(700, seed=700, accelerator=tt.Accelerator.BVH)
    rng = np.random.default_rng(11)
    n = 2048
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d_ = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d_ / np.linalg.norm(d_, axis=-1, keepdims=True))
    t_max = jnp.asarray(rng.uniform(0.05, 3.0, (n,)).astype(np.float32))
    occ = pallas_traverse.raycast(scene, o, d, interpret=True, t_max=t_max)
    ta, tb, tc = scene.geometry.corners()
    ref = intersect.raycast_brute(o, d, ta, tb, tc)
    expect = np.asarray(ref.t) < np.asarray(t_max)
    np.testing.assert_array_equal(np.asarray(occ.hit), expect)
    # and the XLA packet walk agrees too
    from terra_tpu.accel import traverse as xla_traverse

    occ2 = xla_traverse.raycast(scene, o, d, t_max=t_max)
    np.testing.assert_array_equal(np.asarray(occ2.hit), expect)


@pytest.mark.parametrize("tris", [33, 3000])
def test_pallas_watertight_matches_brute(tris):
    """Wald2013 watertight leaf test inside the kernel vs the brute
    watertight sweep (VERDICT r1 item 5: no silent MT fallback)."""
    scene = tt.scenes.random_triangles(tris, seed=tris, accelerator=tt.Accelerator.BVH)
    rng = np.random.default_rng(3)
    n = 2048
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d_ = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d_ / np.linalg.norm(d_, axis=-1, keepdims=True))
    hit_p = pallas_traverse.raycast(scene, o, d, interpret=True, algo="watertight")
    ta, tb, tc = scene.geometry.corners()
    hit_r = intersect.raycast_brute(o, d, ta, tb, tc, algo="watertight")
    np.testing.assert_array_equal(np.asarray(hit_p.hit), np.asarray(hit_r.hit))
    both = np.asarray(hit_p.hit) & np.asarray(hit_r.hit)
    np.testing.assert_allclose(
        np.asarray(hit_p.t)[both], np.asarray(hit_r.t)[both], rtol=1e-4
    )


@pytest.mark.parametrize("shape", [(8, 1), (8, 4), (4, 2), (2, 8), (1, 8), (1, 16)])
def test_pallas_packet_shapes_match_brute(shape):
    """Every (rows_per_packet, interleave_ways) geometry — including the
    narrow 128-ray packets used for incoherent batches — produces the same
    closest hit (the traversal result is packet-shape invariant)."""
    scene = tt.scenes.random_triangles(900, seed=44, accelerator=tt.Accelerator.BVH)
    rng = np.random.default_rng(5)
    n = 4096
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d_ = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d_ / np.linalg.norm(d_, axis=-1, keepdims=True))
    hit_p = pallas_traverse.raycast(scene, o, d, interpret=True, packet_shape=shape)
    ta, tb, tc = scene.geometry.corners()
    hit_r = intersect.raycast_brute(o, d, ta, tb, tc)
    np.testing.assert_array_equal(np.asarray(hit_p.hit), np.asarray(hit_r.hit))
    both = np.asarray(hit_p.hit) & np.asarray(hit_r.hit)
    np.testing.assert_allclose(
        np.asarray(hit_p.t)[both], np.asarray(hit_r.t)[both], rtol=1e-4
    )


def test_pallas_wide_bf16_matches_brute():
    """bf16-quantized wide boxes (conservatively dilated) produce the same
    closest hit as full-precision — quantization may only ADD node visits,
    never lose intersections."""
    scene = tt.scenes.random_triangles(1200, seed=7, accelerator=tt.Accelerator.BVH)
    bvh = scene.bvh
    rng = np.random.default_rng(8)
    n = 2048
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d_ = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d_ / np.linalg.norm(d_, axis=-1, keepdims=True))
    ta, tb, tc = scene.geometry.corners()
    packed = pallas_traverse.pack_tables_wide(bvh, ta, tb, tc, box_enc="bf16")
    bt, bi = pallas_traverse._traverse_pallas(
        bvh, *packed, o, d, interpret=True, packet_rows=8, ways=1,
        arity=4, box_enc="bf16",
    )
    hit_r = intersect.raycast_brute(o, d, ta, tb, tc)
    hw = np.asarray(bt) < intersect.T_FAR
    np.testing.assert_array_equal(hw, np.asarray(hit_r.hit))
    both = hw & np.asarray(hit_r.hit)
    np.testing.assert_allclose(
        np.asarray(bt)[both], np.asarray(hit_r.t)[both], rtol=1e-4
    )


def test_pallas_any_hit_occlusion_matches_ranged():
    """any_hit=True occlusion booleans equal the ranged closest-hit booleans
    (the early-out may only change WHICH hit terminates a lane, never
    whether one exists within t_max)."""
    scene = tt.scenes.random_triangles(900, seed=5, accelerator=tt.Accelerator.BVH)
    rng = np.random.default_rng(6)
    n = 2048
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d_ = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d_ / np.linalg.norm(d_, axis=-1, keepdims=True))
    tm = jnp.asarray(rng.uniform(0.3, 3.0, (n,)).astype(np.float32))
    occ_a = pallas_traverse.raycast(scene, o, d, interpret=True, t_max=tm,
                                    any_hit=True)
    occ_c = pallas_traverse.raycast(scene, o, d, interpret=True, t_max=tm)
    np.testing.assert_array_equal(np.asarray(occ_a.hit), np.asarray(occ_c.hit))


def test_xla_any_hit_occlusion_matches_ranged():
    from terra_tpu.accel import traverse as xw

    scene = tt.scenes.random_triangles(900, seed=5, accelerator=tt.Accelerator.BVH)
    rng = np.random.default_rng(7)
    n = 2048
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d_ = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d_ / np.linalg.norm(d_, axis=-1, keepdims=True))
    tm = jnp.asarray(rng.uniform(0.3, 3.0, (n,)).astype(np.float32))
    occ_a = xw.raycast(scene, o, d, t_max=tm, any_hit=True)
    occ_c = xw.raycast(scene, o, d, t_max=tm)
    np.testing.assert_array_equal(np.asarray(occ_a.hit), np.asarray(occ_c.hit))


@pytest.mark.parametrize("cap", [1, 4, 64])
def test_pallas_paged_matches_brute(cap):
    """Treelet-paged traversal (top ``cap`` wide nodes SMEM-resident, the
    rest DMA'd per visit from HBM rows) is an exact closest-hit at any
    resident split — cap=1 pages essentially the whole tree."""
    scene = tt.scenes.random_triangles(3000, seed=77, accelerator=tt.Accelerator.BVH)
    bvh = scene.bvh
    assert bvh.num_wide > 64, bvh.num_wide
    ta, tb, tc = scene.geometry.corners()
    packed = pallas_traverse.pack_tables_paged(bvh, ta, tb, tc, resident_cap=cap)
    rng = np.random.default_rng(5)
    n = 2048
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d_ = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d_ / np.linalg.norm(d_, axis=-1, keepdims=True))
    hit_p = pallas_traverse.raycast(scene, o, d, interpret=True, packed=packed)
    hit_r = intersect.raycast_brute(o, d, ta, tb, tc)
    h1 = np.asarray(hit_p.hit)
    h2 = np.asarray(hit_r.hit)
    np.testing.assert_array_equal(h1, h2)
    both = h1 & h2
    np.testing.assert_allclose(
        np.asarray(hit_p.t)[both], np.asarray(hit_r.t)[both], rtol=1e-4
    )


def test_pallas_paged_occlusion_and_anyhit():
    """Paged kernel under ranged any-hit occlusion queries (the NEE shadow
    path) agrees with the brute reference."""
    scene = tt.scenes.random_triangles(1500, seed=15, accelerator=tt.Accelerator.BVH)
    ta, tb, tc = scene.geometry.corners()
    packed = pallas_traverse.pack_tables_paged(scene.bvh, ta, tb, tc, resident_cap=8)
    rng = np.random.default_rng(16)
    n = 2048
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d_ = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d_ / np.linalg.norm(d_, axis=-1, keepdims=True))
    t_max = jnp.asarray(rng.uniform(0.05, 3.0, (n,)).astype(np.float32))
    ref = intersect.raycast_brute(o, d, ta, tb, tc)
    expect = np.asarray(ref.t) < np.asarray(t_max)
    occ = pallas_traverse.raycast(scene, o, d, interpret=True, packed=packed,
                                  t_max=t_max)
    np.testing.assert_array_equal(np.asarray(occ.hit), expect)
    occ_a = pallas_traverse.raycast(scene, o, d, interpret=True, packed=packed,
                                    t_max=t_max, any_hit=True)
    np.testing.assert_array_equal(np.asarray(occ_a.hit), expect)


def test_counted_traversal_matches_uncounted_and_decodes():
    """count_steps instrumentation (round-5 decomposition counters) must
    not perturb results, and count_decode's lane-packed fields must be
    internally consistent (pops >= leaves, iters > 0, paged == 0 for a
    resident table)."""
    scene = tt.scenes.random_triangles(1500, seed=15, accelerator=tt.Accelerator.BVH)
    bvh = scene.bvh
    ta, tb, tc = scene.geometry.corners()
    rng = np.random.default_rng(21)
    n = 4096
    o = jnp.asarray(rng.random((n, 3), np.float32) * 2 - 1)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(v / np.linalg.norm(v, axis=1, keepdims=True))
    packed = pallas_traverse.pack_tables_wide(bvh, ta, tb, tc, box_enc="f32")
    kw = dict(interpret=True, packet_rows=32, ways=4, arity=4, box_enc="f32")
    bt0, bi0 = pallas_traverse._traverse_pallas(bvh, *packed, o, d, **kw)
    bt1, bi1, steps = pallas_traverse._traverse_pallas(
        bvh, *packed, o, d, count_steps=True, **kw)
    np.testing.assert_array_equal(np.asarray(bt0), np.asarray(bt1))
    np.testing.assert_array_equal(np.asarray(bi0), np.asarray(bi1))
    c = pallas_traverse.count_decode(np.asarray(steps), 32)
    assert (c["iters"] > 0).all()
    assert c["pops"].sum() >= c["leaves"].sum() > 0
    assert (c["pops"] <= 4 * c["iters"]).all()
    assert (c["paged"] == 0).all()
