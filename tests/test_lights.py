"""Area-weighted NEE light picking (RenderOptions.light_pick=AREA).

The reference picks light triangles uniformly (Terra.c:1618-1619); the
area-CDF pick is the extension VERDICT r1 asked to wire end-to-end: the CDF
built at commit (scene.build_light_table) drives lights.pick_and_sample via
the render_light_pick option, stays unbiased, and lane-matches the NumPy
mirror oracle.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import terra_tpu as tt
from terra_tpu import lights
from terra_tpu.scene import ATTR, LightPick, MaterialTable, commit
from terra_tpu.scenes import make_geometry
from terra_tpu.testing import mirror


def _two_light_scene():
    """Floor + two downward-facing lights with a 4:1 area ratio."""
    tris = [
        # floor (y=0), wound so cross(e0,e1) points +y
        ((0, 0, 0), (4, 0, 4), (4, 0, 0)),
        ((0, 0, 0), (0, 0, 4), (4, 0, 4)),
        # small light (area 0.5) at y=2, normal -y
        ((1, 2, 1), (2, 2, 1), (1, 2, 2)),
        # big light (area 2.0) at y=2, normal -y
        ((2.5, 2, 2.5), (0.5, 2, 2.5), (2.5, 2, 0.5)),
    ]
    mids = [0, 0, 1, 1]
    geom = make_geometry(tris, mids)
    attrs = np.zeros((2, 8, 3), np.float32)
    attrs[0, ATTR.DIFFUSE_ALBEDO] = (0.7, 0.7, 0.7)
    emissive = np.zeros((2, 3), np.float32)
    emissive[1] = (5.0, 5.0, 5.0)
    mats = MaterialTable(
        bsdf_type=jnp.zeros((2,), jnp.int32),
        attrs=jnp.asarray(attrs),
        attr_tex=jnp.full((2, 8), -1, jnp.int32),
        emissive=jnp.asarray(emissive),
        emissive_tex=jnp.full((2,), -1, jnp.int32),
        ior=jnp.full((2,), 1.5, jnp.float32),
    )
    return commit(geom, mats)


def _camera():
    return tt.Camera.make(
        position=(2.0, 1.2, 2.0), direction=(0.2, -1.0, 0.1), up=(0, 0, 1),
        fov_deg=60.0,
    )


def test_area_pick_distribution_and_pdf():
    scene = _two_light_scene()
    n = 4096
    e = (np.arange(n, dtype=np.float32) + 0.5) / n
    zeros = jnp.zeros((n,), jnp.float32)
    ls = lights.pick_and_sample(scene, jnp.asarray(e), zeros, zeros, area_weighted=True)
    areas = np.asarray(scene.lights.area)[: int(scene.lights.num)]
    total = areas.sum()
    # fraction of picks per light follows area/total
    tri_of = np.asarray(scene.lights.tri_idx)
    picked_big = np.mean(np.asarray(ls.tri_idx) == tri_of[np.argmax(areas)])
    assert abs(picked_big - areas.max() / total) < 0.01
    # pick_pdf equals the picked triangle's area share
    pdf = np.asarray(ls.pick_pdf)
    area_of_pick = np.asarray(ls.area)
    np.testing.assert_allclose(pdf, area_of_pick / total, rtol=1e-5)


def test_area_pick_unbiased():
    """Uniform and area picking estimate the same direct lighting."""
    scene = _two_light_scene()
    cam = _camera()
    base = tt.RenderOptions(
        width=12, height=12, samples_per_pixel=64, bounces=0,
        integrator=tt.Integrator.DIRECT,
    )
    img_u = np.asarray(tt.render(scene, cam, base, seed=11).mean())
    img_a = np.asarray(
        tt.render(scene, cam, base.replace(light_pick=LightPick.AREA), seed=12).mean()
    )
    assert np.isfinite(img_u).all() and np.isfinite(img_a).all()
    # same estimator target; MC noise only (area pick has lower variance)
    rel = abs(img_u.mean() - img_a.mean()) / max(img_u.mean(), 1e-6)
    assert rel < 0.06, f"uniform {img_u.mean():.4f} vs area {img_a.mean():.4f}"


def test_area_pick_golden_vs_mirror():
    """Lane-exact oracle agreement with light_pick=AREA."""
    scene = _two_light_scene()
    cam = _camera()
    opts = tt.RenderOptions(
        width=12, height=12, samples_per_pixel=8, bounces=2,
        integrator=tt.Integrator.DIRECT_MIS, subpixel_jitter=0.5,
        light_pick=LightPick.AREA,
    )
    img_jax = np.asarray(tt.render(scene, cam, opts, seed=4).mean())
    img_np = mirror.render_mirror(scene, cam, opts, seed=4)
    rel = np.abs(img_jax - img_np) / np.maximum(np.abs(img_np), 1e-2)
    assert (rel > 2e-3).mean() < 1e-2
    assert abs(img_jax.mean() - img_np.mean()) / max(img_np.mean(), 1e-6) < 5e-3


def test_pick_and_sample_table_matches_gather_path():
    """The packed light-row table (surface.build_shade_tables.light; the
    round-4 config-2 fix) must produce BIT-IDENTICAL samples to the
    chained-gather fallback for both pick strategies."""
    import jax.numpy as jnp

    from terra_tpu import lights as lights_mod
    from terra_tpu.surface import build_shade_tables

    scene = _two_light_scene()
    tables = build_shade_tables(scene)
    rng = np.random.default_rng(8)
    n = 4096
    e_pick = jnp.asarray(rng.random(n, np.float32))
    e1 = jnp.asarray(rng.random(n, np.float32))
    e2 = jnp.asarray(rng.random(n, np.float32))
    for area_weighted in (False, True):
        a = lights_mod.pick_and_sample(scene, e_pick, e1, e2,
                                       area_weighted=area_weighted)
        b = lights_mod.pick_and_sample(scene, e_pick, e1, e2,
                                       area_weighted=area_weighted,
                                       table=tables.light)
        for field in ("tri_idx", "pos", "normal", "uv", "area",
                      "pick_pdf", "area_pdf", "emissive"):
            np.testing.assert_array_equal(
                np.asarray(getattr(a, field)), np.asarray(getattr(b, field)),
                err_msg=f"{field} (area_weighted={area_weighted})",
            )
