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


# ---------------------------------------------------------------- watertight

def _wt_grid(o, d, a, b, c):
    return intersect.mt_grid_components(o, d, a, b, c, algo="watertight")


def test_watertight_matches_mt_on_random_scene():
    """Wald2013 and MT agree on every non-degenerate hit (valid mask and t)."""
    scene = scenes.random_triangles(128, seed=11)
    tri_a, tri_b, tri_c = scene.geometry.corners()
    rng = np.random.default_rng(1)
    n = 1024
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)

    v_mt, t_mt = intersect.mt_grid_components(o, d, tri_a, tri_b, tri_c)
    v_wt, t_wt = _wt_grid(o, d, tri_a, tri_b, tri_c)
    v_mt = np.asarray(v_mt)
    v_wt = np.asarray(v_wt)
    t_mt = np.asarray(t_mt)
    t_wt = np.asarray(t_wt)
    both = v_mt & v_wt
    # hit/miss disagreements only where MT's det-epsilon culls (rare)
    assert np.mean(v_mt ^ v_wt) < 1e-3
    np.testing.assert_allclose(t_wt[both], t_mt[both], rtol=1e-3, atol=1e-4)


def test_watertight_no_cracks_on_shared_edge():
    """Rays aimed exactly at the shared diagonal of a quad (two triangles)
    must hit at least one of them — the watertight guarantee
    (TerraGeometry.c:98-259; MT's barycentric epsilon can leak here)."""
    # unit quad in z=1 plane split along the diagonal (0,0)-(1,1)
    a1 = jnp.asarray([[0.0, 0.0, 1.0]]); b1 = jnp.asarray([[1.0, 0.0, 1.0]]); c1 = jnp.asarray([[1.0, 1.0, 1.0]])
    a2 = jnp.asarray([[0.0, 0.0, 1.0]]); b2 = jnp.asarray([[1.0, 1.0, 1.0]]); c2 = jnp.asarray([[0.0, 1.0, 1.0]])
    tri_a = jnp.concatenate([a1, a2]); tri_b = jnp.concatenate([b1, b2]); tri_c = jnp.concatenate([c1, c2])
    # rays through points exactly on the diagonal (u == v)
    s = np.linspace(0.05, 0.95, 64, dtype=np.float32)
    o = np.stack([s, s, np.zeros_like(s)], axis=-1)
    # perturb by the smallest representable steps around the diagonal too
    o_eps = o.copy(); o_eps[:, 0] = np.nextafter(o_eps[:, 0], np.float32(2.0))
    o = np.concatenate([o, o_eps], axis=0)
    d = np.broadcast_to(np.asarray([0.0, 0.0, 1.0], np.float32), o.shape)
    valid, t = _wt_grid(jnp.asarray(o), jnp.asarray(d), tri_a, tri_b, tri_c)
    hits_any = np.asarray(valid).any(axis=1)
    assert hits_any.all(), f"{(~hits_any).sum()} rays leaked through the shared edge"


def test_watertight_vertex_hit():
    """A ray exactly through a shared vertex hits (sign test tolerates
    two zero barycentrics)."""
    a = jnp.asarray([[0.0, 0.0, 2.0]]); b = jnp.asarray([[1.0, 0.0, 2.0]]); c = jnp.asarray([[0.0, 1.0, 2.0]])
    o = jnp.asarray([[0.0, 0.0, 0.0]]); d = jnp.asarray([[0.0, 0.0, 1.0]])
    valid, t = _wt_grid(o, d, a, b, c)
    assert bool(np.asarray(valid)[0, 0])
    np.testing.assert_allclose(float(np.asarray(t)[0, 0]), 2.0, rtol=1e-5)


def test_watertight_raycast_brute_closest_hit():
    """raycast_brute(algo='watertight') returns the same closest hits as MT
    on a random scene (away from edges)."""
    scene = scenes.random_triangles(200, seed=3)
    tri_a, tri_b, tri_c = scene.geometry.corners()
    rng = np.random.default_rng(7)
    n = 1024
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    h_mt = intersect.raycast_brute(o, d, tri_a, tri_b, tri_c, ray_chunk=512, tri_block=64)
    h_wt = intersect.raycast_brute(o, d, tri_a, tri_b, tri_c, ray_chunk=512, tri_block=64, algo="watertight")
    agree = np.asarray(h_mt.hit) == np.asarray(h_wt.hit)
    assert agree.mean() > 0.999
    both = np.asarray(h_mt.hit) & np.asarray(h_wt.hit) & (np.asarray(h_mt.tri) == np.asarray(h_wt.tri))
    np.testing.assert_allclose(np.asarray(h_wt.t)[both], np.asarray(h_mt.t)[both], rtol=1e-3, atol=1e-4)


def test_watertight_end_to_end_render():
    """A Cornell render with intersector=watertight is close to the MT
    render (same seeds; only edge-grazing lanes may differ)."""
    import terra_tpu as tt
    from terra_tpu.render import render

    scene = tt.scenes.cornell_box()
    cam = tt.scenes.cornell_camera()
    base = tt.RenderOptions(width=32, height=32, samples_per_pixel=8, bounces=3,
                            integrator=tt.Integrator.SIMPLE, subpixel_jitter=0.5)
    img_mt = np.asarray(render(scene, cam, base, seed=0).acc)
    img_wt = np.asarray(render(scene, cam, base.replace(intersector=tt.Intersector.WATERTIGHT), seed=0).acc)
    # identical modulo rare edge-decision flips
    close = np.isclose(img_mt, img_wt, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.98
