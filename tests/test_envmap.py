"""Environment importance sampling tests (envmap.py): pdf correctness,
sample<->pdf consistency, and estimator agreement between the env-NEE
integrators and the plain miss-add path."""
import numpy as np
import jax.numpy as jnp
import pytest

import terra_tpu as tt
from terra_tpu import envmap
from terra_tpu.ops import rng as rng_mod


def _env_scene(tex=None, const=(1.0, 1.0, 1.0)):
    """Open scene: one diffuse floor quad, lit only by the environment."""
    import terra_tpu.scene as sc

    positions = np.asarray(
        [[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]], np.float32
    )
    tris = np.asarray([[0, 2, 1], [0, 3, 2]], np.int32)
    normals = np.tile(np.asarray([0, 1, 0], np.float32), (2, 3, 1))
    uvs = np.zeros((2, 3, 2), np.float32)
    geom = sc.Geometry(
        positions=jnp.asarray(positions), tri_vidx=jnp.asarray(tris),
        normals=jnp.asarray(normals), uvs=jnp.asarray(uvs),
        mat_id=jnp.zeros(2, jnp.int32), obj_id=jnp.zeros(2, jnp.int32),
    )
    attrs = np.zeros((1, 8, 3), np.float32)
    attrs[0, tt.ATTR.DIFFUSE_ALBEDO] = (0.7, 0.7, 0.7)
    mats = sc.MaterialTable(
        attrs=jnp.asarray(attrs),
        bsdf_type=jnp.zeros(1, jnp.int32),
        emissive=jnp.zeros((1, 3), jnp.float32),
        ior=jnp.full((1,), 1.5, jnp.float32),
        attr_tex=jnp.full((1, 8), -1, jnp.int32),
        emissive_tex=jnp.full((1,), -1, jnp.int32),
        types_present=(0,),
    )
    if tex is not None:
        atlas = sc.TextureAtlas(
            data=jnp.asarray(tex[None]), size=jnp.asarray([[tex.shape[0], tex.shape[1]]], jnp.int32),
            filter=jnp.zeros(1, jnp.int32), address=jnp.zeros(1, jnp.int32),
        )
        env_tex = 0
    else:
        atlas = sc.TextureAtlas.empty()
        env_tex = -1
    return tt.commit(geom, mats, textures=atlas, env_value=const, env_tex=env_tex)


def test_env_pdf_integrates_to_one_constant():
    """Constant env -> proposal ~ sin(theta) -> pdf integrates to 1 over
    the sphere (MC with uniform-sphere directions)."""
    scene = _env_scene()
    dist = envmap.build_distribution(scene)
    rng = np.random.default_rng(0)
    v = rng.normal(size=(1 << 16, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    p = np.asarray(envmap.pdf(dist, jnp.asarray(v)))
    assert np.isfinite(p).all() and (p >= 0).all()
    integral = (p * 4 * np.pi).mean()
    assert abs(integral - 1.0) < 0.03, integral


def test_env_pdf_integrates_to_one_textured():
    """A strongly peaked env texture still integrates to 1."""
    tex = np.full((32, 64, 3), 0.05, np.float32)
    tex[8:12, 20:28] = 50.0  # bright "sun" patch
    scene = _env_scene(tex=tex)
    dist = envmap.build_distribution(scene)
    rng = np.random.default_rng(1)
    v = rng.normal(size=(1 << 17, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    p = np.asarray(envmap.pdf(dist, jnp.asarray(v)))
    integral = (p * 4 * np.pi).mean()
    assert abs(integral - 1.0) < 0.1, integral


def test_env_sample_pdf_consistency():
    """pdf(sample()) matches the pdf returned by sample() (same tables)."""
    tex = np.full((16, 32, 3), 0.2, np.float32)
    tex[4:6, 10:14] = 20.0
    scene = _env_scene(tex=tex)
    dist = envmap.build_distribution(scene)
    n = 1 << 14
    k = rng_mod.key_from_seed(2)
    pix = jnp.arange(n, dtype=jnp.uint32)
    e1 = rng_mod.path_uniform(k, pix, 0, 0, 13)
    e2 = rng_mod.path_uniform(k, pix, 0, 0, 14)
    wi, p_sample = envmap.sample(dist, e1, e2)
    p_eval = envmap.pdf(dist, wi)
    np.testing.assert_allclose(
        np.asarray(p_eval), np.asarray(p_sample), rtol=2e-2, atol=1e-4
    )
    # sampled directions are unit
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(wi), axis=-1), 1.0, atol=1e-5
    )


def test_env_sample_concentrates_on_bright_patch():
    tex = np.full((16, 32, 3), 0.01, np.float32)
    tex[4:6, 10:14] = 100.0
    scene = _env_scene(tex=tex)
    dist = envmap.build_distribution(scene)
    n = 1 << 13
    k = rng_mod.key_from_seed(5)
    pix = jnp.arange(n, dtype=jnp.uint32)
    e1 = rng_mod.path_uniform(k, pix, 0, 0, 13)
    e2 = rng_mod.path_uniform(k, pix, 0, 0, 14)
    wi, _ = envmap.sample(dist, e1, e2)
    rad = np.asarray(envmap.radiance(scene, wi))
    # most samples land on the bright patch
    assert (rad[:, 0] > 1.0).mean() > 0.7


@pytest.mark.parametrize("integrator", [tt.Integrator.DIRECT, tt.Integrator.DIRECT_MIS])
def test_env_nee_matches_miss_estimator(integrator):
    """The env-NEE estimator agrees with the plain env-on-miss estimator on
    a diffuse floor under a constant white sky (both estimate the same
    integral: albedo * E, here ~0.7 * 1.0 directly above the floor)."""
    from terra_tpu.render import render

    scene = _env_scene(const=(1.0, 1.0, 1.0))
    cam = tt.Camera.make(position=(0, 0.5, 1.2), direction=(0, -0.4, -1),
                         up=(0, 1, 0), fov_deg=45.0)
    base = tt.RenderOptions(width=24, height=24, samples_per_pixel=64,
                            bounces=2, subpixel_jitter=0.5,
                            integrator=integrator, env_on_miss=True)
    img_miss = np.asarray(render(scene, cam, base, seed=0).acc) / 64
    img_nee = np.asarray(render(scene, cam, base.replace(env_nee=True), seed=0).acc) / 64
    # compare means over floor pixels (both MC estimates of the same image)
    floor = img_miss[:, :, 1] > 0.1
    assert floor.sum() > 50
    m1 = img_miss[floor].mean()
    m2 = img_nee[floor].mean()
    assert abs(m1 - m2) / m1 < 0.08, (m1, m2)
    assert np.isfinite(img_nee).all()
