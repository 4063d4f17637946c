"""Intersection kernel tests: analytic cases + brute raycast vs NumPy mirror."""
import numpy as np
import jax.numpy as jnp

from terra_tpu import intersect, scenes
from terra_tpu.testing import mirror


def test_moller_trumbore_analytic():
    a = jnp.asarray([[0.0, 0.0, 5.0]])
    b = jnp.asarray([[2.0, 0.0, 5.0]])
    c = jnp.asarray([[0.0, 2.0, 5.0]])
    o = jnp.asarray([[0.5, 0.5, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    valid, t, u, v = intersect.moller_trumbore(o, d, a, b, c)
    assert bool(valid[0])
    np.testing.assert_allclose(float(t[0]), 5.0, atol=1e-5)
    np.testing.assert_allclose(float(u[0]), 0.25, atol=1e-5)
    np.testing.assert_allclose(float(v[0]), 0.25, atol=1e-5)
    # miss: outside the triangle
    o2 = jnp.asarray([[3.0, 3.0, 0.0]])
    valid2, *_ = intersect.moller_trumbore(o2, d, a, b, c)
    assert not bool(valid2[0])
    # behind the origin
    o3 = jnp.asarray([[0.5, 0.5, 10.0]])
    valid3, *_ = intersect.moller_trumbore(o3, d, a, b, c)
    assert not bool(valid3[0])


def test_ray_aabb():
    o = jnp.asarray([[0.0, 0.0, -5.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    hit, tmin, tmax = intersect.ray_aabb(o, 1.0 / d, jnp.asarray([[-1.0, -1.0, -1.0]]), jnp.asarray([[1.0, 1.0, 1.0]]))
    assert bool(hit[0])
    np.testing.assert_allclose(float(tmin[0]), 4.0, atol=1e-5)
    np.testing.assert_allclose(float(tmax[0]), 6.0, atol=1e-5)
    # pointing away
    hit2, *_ = intersect.ray_aabb(o, -1.0 / d, jnp.asarray([[-1.0, -1.0, -1.0]]), jnp.asarray([[1.0, 1.0, 1.0]]))
    assert not bool(hit2[0])


def test_raycast_brute_vs_mirror_random_scene():
    scene = scenes.random_triangles(333, seed=5)
    sc = mirror.SceneNp(scene)
    rng = np.random.default_rng(0)
    n = 2048
    o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    tri_a, tri_b, tri_c = scene.geometry.corners()
    hit = intersect.raycast_brute(
        jnp.asarray(o) + jnp.asarray(d) * intersect.RAY_OFFSET_DIR,
        jnp.asarray(d), tri_a, tri_b, tri_c,
        ray_chunk=512, tri_block=128,
    )
    t_np, tri_np, hit_np, _ = mirror.raycast(sc, o, d)
    j_hit = np.asarray(hit.hit)
    j_tri = np.asarray(hit.tri)
    j_t = np.asarray(hit.t)
    # identical hit/miss classification and (up to fp ties) the same triangle
    agree = j_hit == hit_np
    assert agree.mean() > 0.999
    both = j_hit & hit_np & agree
    same_tri = (j_tri[both] == tri_np[both])
    # fp tie-breaks may differ on a tiny fraction
    assert same_tri.mean() > 0.995
    np.testing.assert_allclose(j_t[both][same_tri], t_np[both][same_tri], rtol=1e-4)


def test_raycast_brute_padding_edges():
    """Ray and triangle counts that are not multiples of the chunk sizes."""
    scene = scenes.random_triangles(97, seed=2)
    tri_a, tri_b, tri_c = scene.geometry.corners()
    rng = np.random.default_rng(3)
    o = jnp.asarray(rng.uniform(-2, 2, (37, 3)).astype(np.float32))
    d_ = rng.normal(size=(37, 3)).astype(np.float32)
    d = jnp.asarray(d_ / np.linalg.norm(d_, axis=-1, keepdims=True))
    hit = intersect.raycast_brute(o, d, tri_a, tri_b, tri_c, ray_chunk=16, tri_block=32)
    assert hit.t.shape == (37,)
    assert bool(jnp.all(jnp.isfinite(hit.t) | ~hit.hit))
