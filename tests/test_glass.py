"""Dielectric transmission (BSDFType.GLASS) — the reference's disabled
perfect-glass preset (TerraPresets.c:397-465) rebuilt with working
refraction/TIR/Fresnel: unit physics checks, a white furnace energy test,
transmission-through-geometry, and a golden mirror-oracle render.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import terra_tpu as tt
from terra_tpu import bsdf
from terra_tpu.scene import ATTR, BSDFType, MaterialTable, commit
from terra_tpu.scenes import make_geometry
from terra_tpu.surface import Surface
from terra_tpu.testing import mirror


def _glass_surface(n=(0.0, 1.0, 0.0), ior=1.5, count=1):
    """Minimal Surface batch for unit-testing the glass lobe."""
    nrm = jnp.tile(jnp.asarray([n], jnp.float32), (count, 1))
    from terra_tpu.ops import math3

    t, b = math3.build_basis(nrm)
    attrs = jnp.zeros((count, 8, 3), jnp.float32).at[:, ATTR.GLASS_COLOR].set(1.0)
    z3 = jnp.zeros((count, 3), jnp.float32)
    z = jnp.zeros((count,), jnp.float32)
    return Surface(
        point=z3, normal=nrm, tangent=t, bitangent=b,
        uv=jnp.zeros((count, 2), jnp.float32), attrs=attrs, emissive=z3,
        mat_id=jnp.zeros((count,), jnp.int32),
        bsdf_type=jnp.full((count,), int(BSDFType.GLASS), jnp.int32),
        ior=jnp.full((count,), ior, jnp.float32), t=z,
        obj_id=jnp.zeros((count,), jnp.int32), tri_area=z,
    )


def test_glass_normal_incidence():
    """Straight-on: refracted ray continues straight; R = ((1-n)/(1+n))^2."""
    surf = _glass_surface(ior=1.5)
    wo = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)  # looking straight down
    # e2 >= R -> transmit
    wi = bsdf.sample(surf, jnp.asarray([0.5]), jnp.asarray([0.5]),
                     jnp.asarray([0.9]), wo)[0]
    np.testing.assert_allclose(np.asarray(wi), [[0.0, -1.0, 0.0]], atol=1e-6)
    # e2 < R -> reflect
    r0 = ((1 - 1.5) / (1 + 1.5)) ** 2  # 0.04
    wi_r = bsdf.sample(surf, jnp.asarray([0.5]), jnp.asarray([0.5]),
                       jnp.asarray([r0 * 0.5]), wo)[0]
    np.testing.assert_allclose(np.asarray(wi_r), [[0.0, 1.0, 0.0]], atol=1e-6)
    # pdf/eval consistency: f * |NoL| / pdf == tint for both lobes
    for wi_k in (wi, wi_r):
        p = bsdf.pdf(surf, wi_k, wo, jnp.zeros((1,)), (int(BSDFType.GLASS),))
        f = bsdf.eval_f(surf, wi_k, wo, (int(BSDFType.GLASS),))
        anol = np.abs(np.asarray(wi_k)[:, 1])
        ratio = np.asarray(f)[:, 0] * anol / np.asarray(p)
        np.testing.assert_allclose(ratio, 1.0, rtol=1e-5)


def test_glass_snell_angle():
    """45 deg entering ior 1.5: sin(t) = sin(45)/1.5."""
    surf = _glass_surface(ior=1.5)
    s = np.float32(np.sqrt(0.5))
    wo = jnp.asarray([[s, s, 0.0]], jnp.float32)  # view 45 deg off normal
    wi = bsdf.sample(surf, jnp.asarray([0.5]), jnp.asarray([0.5]),
                     jnp.asarray([0.99]), wo)[0]  # transmit branch
    wi = np.asarray(wi)[0]
    assert wi[1] < 0  # crossed the surface
    sin_t = np.linalg.norm(wi[[0, 2]])
    np.testing.assert_allclose(sin_t, np.sqrt(0.5) / 1.5, rtol=1e-5)
    # tangential direction preserved (continuity)
    assert wi[0] < 0  # bends toward -x (opposite the view's +x)


def test_glass_tir():
    """Inside the medium beyond the critical angle: all rays reflect."""
    surf = _glass_surface(ior=1.5)
    # exiting (wo below surface), grazing: sin_crit = 1/1.5 -> crit ~ 41.8 deg
    ang = np.deg2rad(60.0)
    wo = jnp.asarray([[np.sin(ang), -np.cos(ang), 0.0]], jnp.float32)
    for e2 in (0.01, 0.5, 0.99):  # every pick reflects under TIR
        wi = bsdf.sample(surf, jnp.asarray([0.5]), jnp.asarray([0.5]),
                         jnp.asarray([e2], jnp.float32), wo)[0]
        wi = np.asarray(wi)[0]
        # mirror reflection about -n: wi.y == wo.y, tangential flips
        np.testing.assert_allclose(wi[1], -np.cos(ang), atol=1e-5)
        np.testing.assert_allclose(wi[0], -np.sin(ang), atol=1e-5)


def test_glass_fresnel_energy():
    """R in [0,1] and the two lobe weights always sum to 1 (pdf sums)."""
    surf = _glass_surface(ior=1.5, count=64)
    rng = np.random.default_rng(0)
    v = rng.normal(size=(64, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    wo = jnp.asarray(v)
    wi_t = bsdf.sample(surf, jnp.zeros(64), jnp.zeros(64), jnp.full((64,), 0.9999, jnp.float32), wo)[0]
    wi_r = bsdf.sample(surf, jnp.zeros(64), jnp.zeros(64), jnp.zeros((64,), jnp.float32), wo)[0]
    p_t = np.asarray(bsdf.pdf(surf, wi_t, wo, jnp.zeros(64), (5,)))
    p_r = np.asarray(bsdf.pdf(surf, wi_r, wo, jnp.zeros(64), (5,)))
    total = np.where(np.abs(np.asarray(bsdf.eval_f(surf, wi_t, wo, (5,))).sum(-1)) > 0, p_t + p_r, 1.0)
    # under TIR both picks give the same reflection ray: pdf 1 either way
    same = (np.abs(np.asarray(wi_t) - np.asarray(wi_r)).max(axis=-1) < 1e-5)
    total = np.where(same, p_r, total)
    np.testing.assert_allclose(total, 1.0, atol=1e-5)


def _glass_slab_scene(ior=1.5):
    """A floating glass slab (axis-aligned box) in an empty environment."""
    lo = np.asarray([-1.0, -0.2, -1.0])
    hi = np.asarray([1.0, 0.2, 1.0])
    corners = [
        (lo[0], lo[1], lo[2]), (hi[0], lo[1], lo[2]),
        (hi[0], lo[1], hi[2]), (lo[0], lo[1], hi[2]),
        (lo[0], hi[1], lo[2]), (hi[0], hi[1], lo[2]),
        (hi[0], hi[1], hi[2]), (lo[0], hi[1], hi[2]),
    ]
    tris = []
    mids = []

    def quad(a, b, c, d):
        tris.append((corners[a], corners[b], corners[c]))
        tris.append((corners[a], corners[c], corners[d]))
        mids.extend([0, 0])

    # bottom (normal -y): order so cross points down
    quad(0, 1, 2, 3)
    # top (+y)
    quad(4, 7, 6, 5)
    # sides
    quad(0, 4, 5, 1)
    quad(1, 5, 6, 2)
    quad(2, 6, 7, 3)
    quad(3, 7, 4, 0)
    geom = make_geometry(tris, mids)
    attrs = np.zeros((1, 8, 3), np.float32)
    attrs[0, ATTR.GLASS_COLOR] = (1, 1, 1)
    mats = MaterialTable(
        bsdf_type=jnp.full((1,), int(BSDFType.GLASS), jnp.int32),
        attrs=jnp.asarray(attrs),
        attr_tex=jnp.full((1, 8), -1, jnp.int32),
        emissive=jnp.zeros((1, 3), jnp.float32),
        emissive_tex=jnp.full((1,), -1, jnp.int32),
        ior=jnp.full((1,), ior, jnp.float32),
    )
    return commit(geom, mats, env_value=(1.0, 1.0, 1.0))


def test_glass_furnace():
    """White furnace: a clear glass slab in a unit environment must neither
    create nor destroy energy (paths reflect/refract losslessly)."""
    scene = _glass_slab_scene()
    cam = tt.Camera.make(position=(0.0, 2.0, 0.0), direction=(0.0, -1.0, 0.05),
                         up=(0, 0, 1), fov_deg=50.0)
    opts = tt.RenderOptions(
        width=16, height=16, samples_per_pixel=16, bounces=12,
        integrator=tt.Integrator.SIMPLE, env_on_miss=True, subpixel_jitter=0.5,
        rr_start_bounce=16,  # no roulette: count pure path termination
    )
    img = np.asarray(tt.render(scene, cam, opts, seed=1).mean())
    assert np.isfinite(img).all()
    # nearly all energy accounted for; depth-truncated TIR paths lose a bit
    assert img.mean() > 0.97, f"furnace mean {img.mean():.4f}"
    assert img.max() <= 1.0 + 1e-4


def test_glass_transmits_light():
    """Paths pass through geometry: a camera under the slab still sees the
    bright environment through it (the r1 build's unconditional normal-side
    offset made transmission impossible)."""
    scene = _glass_slab_scene()
    cam = tt.Camera.make(position=(0.0, -2.0, 0.0), direction=(0.0, 1.0, 0.05),
                         up=(0, 0, 1), fov_deg=30.0)  # looking up through slab
    opts = tt.RenderOptions(
        width=8, height=8, samples_per_pixel=8, bounces=8,
        integrator=tt.Integrator.SIMPLE, env_on_miss=True,
    )
    img = np.asarray(tt.render(scene, cam, opts, seed=2).mean())
    assert img.mean() > 0.8  # mostly transmitted


def test_glass_golden_cornell():
    """Golden: glass short block in the Cornell box, lane-matched against
    the NumPy oracle."""
    scene = tt.scenes.cornell_box(block_bsdf=BSDFType.GLASS)
    cam = tt.scenes.cornell_camera()
    opts = tt.RenderOptions(
        width=20, height=20, samples_per_pixel=8, bounces=4,
        integrator=tt.Integrator.DIRECT, subpixel_jitter=0.5,
    )
    film = tt.render(scene, cam, opts, seed=7)
    img_jax = np.asarray(film.mean())
    img_np = mirror.render_mirror(scene, cam, opts, seed=7)
    from tests.test_golden import _assert_twin_match

    # glass doubles the delta-alignment decisions; allow a slightly larger
    # ulp-flip budget than the diffuse goldens
    _assert_twin_match(img_jax, img_np, 2e-3, 1.5e-2, 6e-3)


def test_glass_obj_import(tmp_path):
    import textwrap
    (tmp_path / "g.mtl").write_text(textwrap.dedent("""\
        newmtl pane
        Kd 0 0 0
        Ni 1.33
        Tf 0.9 0.95 1.0
        illum 7
    """))
    (tmp_path / "g.obj").write_text(textwrap.dedent("""\
        mtllib g.mtl
        v 0 0 0
        v 1 0 0
        v 1 1 0
        usemtl pane
        f 1 2 3
    """))
    from terra_tpu.io.obj import load_obj

    geom, mats, _ = load_obj(str(tmp_path / "g.obj"))
    assert int(np.asarray(mats.bsdf_type)[0]) == int(BSDFType.GLASS)
    np.testing.assert_allclose(np.asarray(mats.ior)[0], 1.33, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mats.attrs)[0, ATTR.GLASS_COLOR], [0.9, 0.95, 1.0], rtol=1e-6
    )
