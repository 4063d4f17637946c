"""Sponza-class procedural scene (BASELINE config 3): build + textured
render through the LBVH path on a reduced-size courtyard."""
import numpy as np
import pytest

import terra_tpu as tt


@pytest.fixture(scope="module")
def small_courtyard():
    return tt.scenes.courtyard(grid=40, columns=6, column_segments=10, column_levels=4)


def test_courtyard_builds(small_courtyard):
    scene = small_courtyard
    assert scene.geometry.num_triangles > 3000
    assert scene.bvh is not None
    assert scene.textures.num_textures == 2
    assert int(np.asarray(scene.lights.num)) == 4


def test_courtyard_renders_textured(small_courtyard):
    cam = tt.scenes.courtyard_camera()
    opts = tt.RenderOptions(width=16, height=16, samples_per_pixel=4, bounces=2,
                            integrator=tt.Integrator.DIRECT,
                            accelerator=tt.Accelerator.BVH, subpixel_jitter=0.5)
    img = np.asarray(tt.render(small_courtyard, cam, opts, seed=3).mean())
    assert np.isfinite(img).all()
    assert img.max() > 0.0
    # textured terrain: visible variation across the frame
    assert img.std() > 1e-3


def test_full_scale_courtyard_build_stats():
    """The ~250k-tri build completes quickly through the native builder."""
    import time

    t0 = time.time()
    scene = tt.scenes.courtyard()
    dt = time.time() - t0
    assert scene.geometry.num_triangles > 200_000
    assert dt < 60.0, f"build took {dt:.1f}s"
