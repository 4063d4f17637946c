"""Persistent-lane wavefront: same estimator as the fixed-depth scan."""
import numpy as np
import pytest

import terra_tpu as tt


@pytest.mark.parametrize("integrator", [tt.Integrator.SIMPLE, tt.Integrator.DIRECT])
def test_persistent_matches_scan(integrator):
    scene = tt.scenes.cornell_box()
    cam = tt.scenes.cornell_camera()
    base = dict(width=12, height=12, samples_per_pixel=8, bounces=3,
                integrator=integrator, subpixel_jitter=0.5)
    img_scan = np.asarray(tt.render(scene, cam, tt.RenderOptions(**base), seed=5).mean())
    img_pers = np.asarray(
        tt.render(scene, cam, tt.RenderOptions(**base, samples_per_lane=4), seed=5).mean()
    )
    # identical draws and per-sample math; only f32 accumulation order of
    # the per-pixel sum differs
    np.testing.assert_allclose(img_pers, img_scan, rtol=2e-4, atol=2e-4)


def test_persistent_matches_scan_bvh():
    """Same estimator equality through the BVH traversal path (exercises
    lane regeneration + seeded-t shadow queries + dead-lane miss rays)."""
    scene = tt.scenes.cornell_box(accelerator=tt.Accelerator.BVH)
    cam = tt.scenes.cornell_camera()
    base = dict(width=12, height=12, samples_per_pixel=8, bounces=3,
                integrator=tt.Integrator.DIRECT, subpixel_jitter=0.5,
                accelerator=tt.Accelerator.BVH)
    img_scan = np.asarray(tt.render(scene, cam, tt.RenderOptions(**base), seed=5).mean())
    img_pers = np.asarray(
        tt.render(scene, cam, tt.RenderOptions(**base, samples_per_lane=4), seed=5).mean()
    )
    np.testing.assert_allclose(img_pers, img_scan, rtol=2e-4, atol=2e-4)


def test_persistent_sample_counts():
    scene = tt.scenes.cornell_box()
    cam = tt.scenes.cornell_camera()
    opts = tt.RenderOptions(width=8, height=8, samples_per_pixel=8, bounces=2,
                            samples_per_lane=8)
    film = tt.render(scene, cam, opts, seed=2)
    assert int(np.asarray(film.samples).min()) == 8
    assert int(np.asarray(film.samples).max()) == 8


def test_persistent_progressive_accumulation():
    scene = tt.scenes.cornell_box()
    cam = tt.scenes.cornell_camera()
    one = tt.render(scene, cam, tt.RenderOptions(width=8, height=8, samples_per_pixel=8,
                                                 bounces=2, samples_per_lane=4), seed=3)
    opts4 = tt.RenderOptions(width=8, height=8, samples_per_pixel=4, bounces=2,
                             samples_per_lane=4)
    two = tt.render(scene, cam, opts4, seed=3)
    two = tt.render(scene, cam, opts4, seed=3, film=two)
    np.testing.assert_allclose(np.asarray(one.acc), np.asarray(two.acc), rtol=1e-4, atol=1e-4)
