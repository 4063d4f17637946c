"""Delta-lobe (MIRROR/GLASS) direct lighting under DIRECT / DIRECT_MIS.

VERDICT r3 missing #2: as shipped in rounds 1-3, a light source was
invisible in a mirror under DIRECT (emissive only at bounce 0, NEE's eval_f
~0 at a delta surface) and mis-weighted under DIRECT_MIS (_mirror_pdf
returns 1.0 on the reflection ray, so _power2_weight(1, light_pdf) wrongly
down-weighted the only strategy that can see the light). The fix is a
pbrt-style per-lane specular-bounce flag: emissive pickup re-enabled at the
vertex after a delta bounce, NEE and the MIS BSDF strategy skipped at delta
lanes (integrators._emit_gate/_skip_delta, render.trace's emit_ok carry).

The reference disabled both delta presets (TerraPresets.c:298-465), so
there is no reference behavior to match — these tests pin the physics:

  * analytic: a light seen in a plane mirror must shine at
    emission * mirror_color, identically under DIRECT and DIRECT_MIS;
  * estimator cross-check: DIRECT and DIRECT_MIS agree in expectation on
    the mirror-block Cornell box (different strategies, same integral);
  * golden: both integrators lane-match the NumPy oracle on that scene;
  * glass furnace passes under DIRECT_MIS (not just SIMPLE).
"""
import numpy as np
import pytest

import terra_tpu as tt
from terra_tpu.scene import ATTR, BSDFType, MaterialTable, commit
from terra_tpu.scenes import make_geometry
from terra_tpu.testing import mirror as oracle


def _mirror_sees_light_scene(mirror_color=0.95, emission=5.0):
    """A floor mirror and a vertical light panel: every camera ray reflects
    off the mirror straight into the light. Radiance is delta-deterministic:
    emission * mirror_color, no Monte-Carlo noise."""
    tris = []
    mids = []

    def quad(a, b, c, d, mid):
        tris.append((a, b, c))
        tris.append((a, c, d))
        mids.extend([mid, mid])

    # mirror floor at y=0, normal +y (cross(v1-v0, v2-v0) convention)
    quad((8, 0, -8), (-8, 0, -8), (-8, 0, 8), (8, 0, 8), 0)
    # light panel at z=6 spanning x in [-10,10], y in [1,13], normal -z
    # (facing the mirror/camera side)
    quad((10, 1, 6), (-10, 1, 6), (-10, 13, 6), (10, 13, 6), 1)
    geom = make_geometry(tris, mids)

    attrs = np.zeros((2, 8, 3), np.float32)
    attrs[0, ATTR.MIRROR_COLOR] = (mirror_color,) * 3
    emissive = np.zeros((2, 3), np.float32)
    emissive[1] = (emission,) * 3
    mats = MaterialTable(
        bsdf_type=np.asarray([int(BSDFType.MIRROR), int(BSDFType.DIFFUSE)], np.int32),
        attrs=attrs,
        attr_tex=np.full((2, 8), -1, np.int32),
        emissive=emissive,
        emissive_tex=np.full((2,), -1, np.int32),
        ior=np.full((2,), 1.5, np.float32),
    )
    return commit(geom, mats)


@pytest.mark.parametrize(
    "integrator", [tt.Integrator.DIRECT, tt.Integrator.DIRECT_MIS]
)
def test_light_visible_in_mirror(integrator):
    """The regression: a light reflected by a plane mirror must be visible
    at exactly emission * mirror_color (the r<=3 build rendered black)."""
    scene = _mirror_sees_light_scene(mirror_color=0.95, emission=5.0)
    # camera looks down at the mirror at ~45 degrees; reflections go
    # up-forward into the light panel for the whole (narrow-fov) frame
    cam = tt.Camera.make(
        position=(0.0, 4.0, -4.0), direction=(0.0, -1.0, 1.0),
        up=(0.0, 1.0, 0.0), fov_deg=10.0,
    )
    opts = tt.RenderOptions(
        width=8, height=8, samples_per_pixel=4, bounces=2,
        integrator=integrator, subpixel_jitter=0.5,
        rr_start_bounce=8,  # no roulette: the delta path is deterministic
    )
    img = np.asarray(tt.render(scene, cam, opts, seed=3).mean())
    expected = 5.0 * 0.95
    np.testing.assert_allclose(img, expected, rtol=1e-3)
    # persistent-lane scheduler must carry the same specular flag
    import dataclasses

    opts_p = dataclasses.replace(opts, samples_per_lane=4)
    img_p = np.asarray(tt.render(scene, cam, opts_p, seed=3).mean())
    np.testing.assert_allclose(img_p, expected, rtol=1e-3)


def test_mirror_chain_two_bounces():
    """Two mirrors in sequence keep the specular flag alive: light ->
    mirror -> mirror -> camera shines at emission * color^2."""
    emission, color = 5.0, 0.9
    tris, mids = [], []

    def quad(a, b, c, d, mid):
        tris.append((a, b, c))
        tris.append((a, c, d))
        mids.extend([mid, mid])

    # mirror floor (y=0, normal +y) and mirror ceiling-panel at z=6 tilted?
    # keep it axis-aligned: floor mirror, then a vertical mirror at z=6
    # (normal -z), then the light overhead (y=13 plane, facing down).
    quad((8, 0, -8), (-8, 0, -8), (-8, 0, 8), (8, 0, 8), 0)      # floor mirror
    quad((10, 1, 6), (-10, 1, 6), (-10, 13, 6), (10, 13, 6), 0)  # wall mirror (-z)
    quad((10, 13, -8), (10, 13, 6), (-10, 13, 6), (-10, 13, -8), 1)  # light (-y)
    geom = make_geometry(tris, mids)
    attrs = np.zeros((2, 8, 3), np.float32)
    attrs[0, ATTR.MIRROR_COLOR] = (color,) * 3
    emissive = np.zeros((2, 3), np.float32)
    emissive[1] = (emission,) * 3
    mats = MaterialTable(
        bsdf_type=np.asarray([int(BSDFType.MIRROR), int(BSDFType.DIFFUSE)], np.int32),
        attrs=attrs,
        attr_tex=np.full((2, 8), -1, np.int32),
        emissive=emissive,
        emissive_tex=np.full((2,), -1, np.int32),
        ior=np.full((2,), 1.5, np.float32),
    )
    scene = commit(geom, mats)
    # 45-degree view down: camera ray -> floor (up-forward) -> wall mirror
    # (reflects to up-backward? no: direction (0,1,1)/sqrt2 hits z=6 wall,
    # normal -z flips dz: (0,1,-1)/sqrt2 -> climbs to the y=13 light)
    cam = tt.Camera.make(
        position=(0.0, 4.0, -4.0), direction=(0.0, -1.0, 1.0),
        up=(0.0, 1.0, 0.0), fov_deg=8.0,
    )
    for integ in (tt.Integrator.DIRECT, tt.Integrator.DIRECT_MIS):
        opts = tt.RenderOptions(
            width=6, height=6, samples_per_pixel=2, bounces=3,
            integrator=integ, subpixel_jitter=0.0, rr_start_bounce=8,
        )
        img = np.asarray(tt.render(scene, cam, opts, seed=5).mean())
        np.testing.assert_allclose(img, emission * color * color, rtol=1e-3)


@pytest.mark.parametrize(
    "integrator", [tt.Integrator.DIRECT, tt.Integrator.DIRECT_MIS]
)
def test_mirror_cornell_golden(integrator):
    """Mirror short block in the Cornell box lane-matches the NumPy oracle
    under both direct-lighting integrators (VERDICT r3 'Done' criterion)."""
    scene = tt.scenes.cornell_box(block_bsdf=BSDFType.MIRROR)
    cam = tt.scenes.cornell_camera()
    opts = tt.RenderOptions(
        width=20, height=20, samples_per_pixel=8, bounces=3,
        integrator=integrator, subpixel_jitter=0.5,
    )
    film = tt.render(scene, cam, opts, seed=31)
    img_jax = np.asarray(film.mean())
    img_np = oracle.render_mirror(scene, cam, opts, seed=31)
    from tests.test_golden import _assert_twin_match

    _assert_twin_match(img_jax, img_np, 2e-3, 1.5e-2, 6e-3)


def test_mirror_cornell_direct_vs_mis_expectation():
    """DIRECT and DIRECT_MIS are different estimators of the same integral;
    on the mirror-block Cornell box their converged means must agree. This
    is the cross-check the oracle goldens cannot provide (the oracle shares
    the renderer's conventions by construction)."""
    scene = tt.scenes.cornell_box(block_bsdf=BSDFType.MIRROR)
    cam = tt.scenes.cornell_camera()

    def mean_img(integ, seed):
        opts = tt.RenderOptions(
            width=16, height=16, samples_per_pixel=64, bounces=3,
            integrator=integ, subpixel_jitter=0.5,
        )
        return np.asarray(tt.render(scene, cam, opts, seed=seed).mean())

    a = mean_img(tt.Integrator.DIRECT, seed=41)
    b = mean_img(tt.Integrator.DIRECT_MIS, seed=43)
    # two-seed noise floor of the DIRECT estimator calibrates the bound
    a2 = mean_img(tt.Integrator.DIRECT, seed=43)
    floor = np.abs(a - a2).mean()
    gap = np.abs(a - b).mean()
    assert gap < max(3.0 * floor, 0.01), (
        f"DIRECT vs DIRECT_MIS disagree: gap {gap:.4f}, noise floor {floor:.4f}"
    )


@pytest.mark.parametrize(
    "integrator", [tt.Integrator.DIRECT, tt.Integrator.DIRECT_MIS]
)
def test_env_visible_in_mirror_under_env_nee(integrator):
    """With env-NEE on, the miss-env add is gated by the specular-bounce
    flag (not bounce==0), so the environment stays visible in a mirror:
    a mirror floor under a constant env must reflect env * color."""
    # mirror floor only — reflected rays escape into the environment
    tris = [((8, 0, -8), (-8, 0, -8), (-8, 0, 8)), ((8, 0, -8), (-8, 0, 8), (8, 0, 8))]
    geom = make_geometry(tris, [0, 0])
    attrs = np.zeros((1, 8, 3), np.float32)
    attrs[0, ATTR.MIRROR_COLOR] = (0.9, 0.9, 0.9)
    mats = MaterialTable(
        bsdf_type=np.asarray([int(BSDFType.MIRROR)], np.int32),
        attrs=attrs,
        attr_tex=np.full((1, 8), -1, np.int32),
        emissive=np.zeros((1, 3), np.float32),
        emissive_tex=np.full((1,), -1, np.int32),
        ior=np.full((1,), 1.5, np.float32),
    )
    scene = commit(geom, mats, env_value=(0.6, 0.6, 0.6))
    cam = tt.Camera.make(
        position=(0.0, 4.0, -4.0), direction=(0.0, -1.0, 1.0),
        up=(0.0, 1.0, 0.0), fov_deg=10.0,
    )
    opts = tt.RenderOptions(
        width=6, height=6, samples_per_pixel=4, bounces=2,
        integrator=integrator, subpixel_jitter=0.5, rr_start_bounce=8,
        env_on_miss=True, env_nee=True,
    )
    img = np.asarray(tt.render(scene, cam, opts, seed=7).mean())
    # every camera ray reflects off the mirror and escapes: exactly
    # env * mirror_color = 0.6 * 0.9, no noise (delta path)
    np.testing.assert_allclose(img, 0.54, rtol=1e-3)


def test_glass_furnace_direct_mis():
    """White furnace under DIRECT_MIS (VERDICT r3: the glass furnace only
    ran under SIMPLE): a clear slab in a unit environment neither creates
    nor destroys energy once delta lanes skip NEE and pick the env up via
    the path continuation."""
    from tests.test_glass import _glass_slab_scene

    scene = _glass_slab_scene()
    cam = tt.Camera.make(position=(0.0, 2.0, 0.0), direction=(0.0, -1.0, 0.05),
                         up=(0, 0, 1), fov_deg=50.0)
    opts = tt.RenderOptions(
        width=16, height=16, samples_per_pixel=16, bounces=12,
        integrator=tt.Integrator.DIRECT_MIS, env_on_miss=True,
        subpixel_jitter=0.5, rr_start_bounce=16,
    )
    img = np.asarray(tt.render(scene, cam, opts, seed=1).mean())
    assert np.isfinite(img).all()
    assert img.mean() > 0.97, f"furnace mean {img.mean():.4f}"
    assert img.max() <= 1.0 + 1e-4
