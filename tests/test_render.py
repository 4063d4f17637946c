"""Render smoke + behavior tests on the Cornell box."""
import numpy as np

import terra_tpu as tt


def _render(opts, seed=1, **scene_kw):
    scene = tt.scenes.cornell_box(**scene_kw)
    cam = tt.scenes.cornell_camera()
    return np.asarray(tt.render(scene, cam, opts, seed=seed).mean())


def test_simple_sees_light():
    opts = tt.RenderOptions(width=32, height=32, samples_per_pixel=8, bounces=3,
                            integrator=tt.Integrator.SIMPLE)
    img = _render(opts)
    assert np.isfinite(img).all()
    # ceiling light region should be the brightest area
    assert img.max() > 5.0
    assert img.mean() > 0.01


def test_direct_less_noise_than_simple():
    """NEE should have much lower variance at equal spp."""
    base = dict(width=24, height=24, samples_per_pixel=16, bounces=2)
    img_s1 = _render(tt.RenderOptions(**base, integrator=tt.Integrator.SIMPLE), seed=1)
    img_s2 = _render(tt.RenderOptions(**base, integrator=tt.Integrator.SIMPLE), seed=2)
    img_d1 = _render(tt.RenderOptions(**base, integrator=tt.Integrator.DIRECT), seed=1)
    img_d2 = _render(tt.RenderOptions(**base, integrator=tt.Integrator.DIRECT), seed=2)
    var_s = np.mean((img_s1 - img_s2) ** 2)
    var_d = np.mean((img_d1 - img_d2) ** 2)
    assert var_d < var_s


def test_integrators_agree_in_expectation():
    """SIMPLE, DIRECT and MIS estimate the same integral: means over many
    samples must agree within noise (white-furnace-style consistency)."""
    base = dict(width=16, height=16, samples_per_pixel=256, bounces=3,
                subpixel_jitter=0.5, rr_start_bounce=2)
    img_s = _render(tt.RenderOptions(**base, integrator=tt.Integrator.SIMPLE), seed=7)
    img_d = _render(tt.RenderOptions(**base, integrator=tt.Integrator.DIRECT), seed=8)
    img_m = _render(tt.RenderOptions(**base, integrator=tt.Integrator.DIRECT_MIS), seed=9)
    # compare overall mean radiance (loose: MC noise at 256 spp)
    assert abs(img_d.mean() - img_m.mean()) / img_d.mean() < 0.12
    assert abs(img_s.mean() - img_d.mean()) / img_d.mean() < 0.25


def test_debug_integrators():
    base = dict(width=16, height=16, samples_per_pixel=2, bounces=2)
    mono = _render(tt.RenderOptions(**base, integrator=tt.Integrator.DEBUG_MONO))
    assert set(np.unique(mono.round(3))) <= {0.0, 1.0}
    depth = _render(tt.RenderOptions(**base, integrator=tt.Integrator.DEBUG_DEPTH))
    assert (depth >= 0).all() and depth.max() < 10.0
    normals = _render(tt.RenderOptions(**base, integrator=tt.Integrator.DEBUG_NORMALS))
    # component colors sum; a unit normal can reach sqrt(2) in one channel
    assert normals.max() <= np.sqrt(2.0) + 1e-5
    misw = _render(tt.RenderOptions(**base, integrator=tt.Integrator.DEBUG_MIS_WEIGHTS))
    assert np.isfinite(misw).all()
    assert (misw[..., 1] == 0).all()  # green channel unused (Terra.c:1278,1331)


def test_progressive_accumulation_matches_one_shot():
    scene = tt.scenes.cornell_box()
    cam = tt.scenes.cornell_camera()
    opts8 = tt.RenderOptions(width=12, height=12, samples_per_pixel=8, bounces=2,
                             integrator=tt.Integrator.DIRECT)
    one = tt.render(scene, cam, opts8, seed=4)
    opts4 = opts8.replace(samples_per_pixel=4)
    two = tt.render(scene, cam, opts4, seed=4)
    two = tt.render(scene, cam, opts4, seed=4, film=two)
    np.testing.assert_allclose(np.asarray(one.acc), np.asarray(two.acc), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(one.samples), np.asarray(two.samples))


def test_chunked_launch_matches_one_shot():
    scene = tt.scenes.cornell_box()
    cam = tt.scenes.cornell_camera()
    opts = tt.RenderOptions(width=12, height=12, samples_per_pixel=8, bounces=2)
    a = tt.render(scene, cam, opts, seed=6)
    b = tt.render(scene, cam, opts.replace(samples_per_launch=3), seed=6)
    np.testing.assert_allclose(np.asarray(a.acc), np.asarray(b.acc), rtol=1e-4, atol=1e-4)


def test_ggx_walls_render():
    opts = tt.RenderOptions(width=16, height=16, samples_per_pixel=8, bounces=3,
                            integrator=tt.Integrator.DIRECT_MIS)
    img = _render(opts, wall_bsdf=tt.BSDFType.GGX)
    assert np.isfinite(img).all() and img.mean() > 0.005


def test_env_on_miss():
    scene = tt.scenes.cornell_box()
    scene = tt.Scene(
        geometry=scene.geometry, materials=scene.materials, textures=scene.textures,
        lights=scene.lights, env_value=np.asarray([1.0, 2.0, 3.0], np.float32),
        env_tex=scene.env_tex, bvh=None,
    )
    cam = tt.Camera.make(position=(278, 273, -800), direction=(0, -1, 0))  # look at void
    opts = tt.RenderOptions(width=4, height=4, samples_per_pixel=1, bounces=0,
                            integrator=tt.Integrator.SIMPLE, env_on_miss=True)
    img = np.asarray(tt.render(scene, cam, opts).mean())
    np.testing.assert_allclose(img[0, 0], [1.0, 2.0, 3.0], atol=1e-5)


def test_render_row_banded_matches_whole_frame(monkeypatch):
    """When the frame exceeds MAX_WAVEFRONT_LANES, render() splits into row
    bands; global pixel ids keep the estimator identical, so the banded
    film equals the whole-frame film."""
    import importlib

    render_mod = importlib.import_module("terra_tpu.render")
    scene = tt.scenes.cornell_box()
    cam = tt.scenes.cornell_camera()
    opts = tt.RenderOptions(width=16, height=16, samples_per_pixel=4,
                            bounces=2, integrator=tt.Integrator.DIRECT,
                            subpixel_jitter=0.5)
    ref = np.asarray(tt.render(scene, cam, opts, seed=11).acc)
    monkeypatch.setattr(render_mod, "MAX_WAVEFRONT_LANES", 16 * 4 * 4)
    assert render_mod._band_rows(opts, 4) == 4
    banded = np.asarray(tt.render(scene, cam, opts, seed=11).acc)
    np.testing.assert_allclose(banded, ref, rtol=1e-5, atol=1e-6)


def test_debug_checks_catches_nonfinite():
    """debug_checks host-validates each chunk: a scene poisoned with a NaN
    vertex raises FloatingPointError naming the chunk instead of silently
    writing NaN into the film."""
    import dataclasses
    import jax.numpy as jnp
    import pytest as _pytest

    scene = tt.scenes.cornell_box()
    pos = np.asarray(scene.geometry.positions).copy()
    pos[0] = np.nan
    geom = dataclasses.replace(scene.geometry, positions=jnp.asarray(pos))
    bad_scene = dataclasses.replace(scene, geometry=geom)
    cam = tt.scenes.cornell_camera()
    opts = tt.RenderOptions(width=8, height=8, samples_per_pixel=2, bounces=1,
                            integrator=tt.Integrator.DIRECT, debug_checks=True)
    with _pytest.raises(FloatingPointError, match="non-finite"):
        tt.render(bad_scene, cam, opts, seed=0)
    # and a healthy scene passes with checks on
    film = tt.render(scene, cam, opts, seed=0)
    assert np.isfinite(np.asarray(film.acc)).all()
