"""Statistical cross-validation against the ACTUAL compiled C reference.

Builds the unmodified reference core (/root/reference/src/Terra.c:512's
terra_render and everything under it) with the harness in
tests/reference_cross/main.c, renders the same Cornell scene on both sides
at high spp, and asserts converged-mean agreement within Monte-Carlo noise
bounds. RNG streams necessarily differ (the reference draws from libc
rand(), Terra.c:115), so only statistical agreement is possible — but this
is the one test that can catch a formula misread shared by the renderer
AND its NumPy mirror (the golden tests validate port-consistency, not
ground truth).

Noise calibration is self-measuring: the TPU-port renderer runs twice with
independent seeds, and the block-mean spread between those two runs sets
the scale against which the reference deviation is judged.
"""
import os
import shutil
import subprocess

import numpy as np
import pytest
import jax.numpy as jnp

import terra_tpu as tt
from terra_tpu.render import render
from terra_tpu.scene import ATTR

REFERENCE_ROOT = "/root/reference"
W = H = 48
SPP = 384
BOUNCES = 2
BLOCK = 6  # block-mean comparison granularity (noise averages down ~6x)


@pytest.fixture(scope="module")
def ref_binary(tmp_path_factory):
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "src")):
        pytest.skip("reference sources unavailable")
    cc = shutil.which("cc") or shutil.which("gcc")
    if cc is None:
        pytest.skip("no C compiler available")
    build = tmp_path_factory.mktemp("refbuild")
    exe = str(build / "terra_ref")
    srcs = [
        os.path.join(REFERENCE_ROOT, "src", n)
        for n in ("Terra.c", "TerraBVH.c", "TerraGeometry.c",
                  "TerraPresets.c", "TerraProfile.c")
    ]
    main_c = os.path.join(os.path.dirname(__file__), "reference_cross", "main.c")
    subprocess.run(
        # -include time.h: TerraProfile.h uses clock_t without including
        # <time.h> (the reference builds on MSVC where it leaks in)
        [cc, "-O2", "-std=c99", "-include", "time.h",
         f"-I{REFERENCE_ROOT}/include",
         f"-I{REFERENCE_ROOT}/src", main_c, *srcs, "-o", exe, "-lm"],
        check=True, capture_output=True,
    )
    return exe


def _dump_scene(scene, cam, path):
    """Write the scene in the harness's text format, grouped by object."""
    geom = scene.geometry
    pos = np.asarray(geom.positions)
    vidx = np.asarray(geom.tri_vidx)
    normals = np.asarray(geom.normals)  # (T, 3, 3)
    mat_id = np.asarray(geom.mat_id)
    obj_id = np.asarray(geom.obj_id)
    attrs = np.asarray(scene.materials.attrs)
    emissive = np.asarray(scene.materials.emissive)

    bsdf_types = np.asarray(scene.materials.bsdf_type)

    def f3(v):
        return f"{v[0]:.9g} {v[1]:.9g} {v[2]:.9g}"

    with open(path, "w") as f:
        f.write(f"{f3(np.asarray(cam.position))} {f3(np.asarray(cam.direction))} "
                f"{f3(np.asarray(cam.up))} {float(cam.fov_deg):.9g}\n")
        objects = np.unique(obj_id)
        f.write(f"{len(objects)}\n")
        for o in objects:
            tris = np.nonzero(obj_id == o)[0]
            mids = np.unique(mat_id[tris])
            assert len(mids) == 1, "harness assumes one material per object"
            mid = int(mids[0])
            btype = int(bsdf_types[mid])
            assert btype in (0, 1), "harness supports diffuse/phong only"
            albedo = attrs[mid, ATTR.PHONG_ALBEDO if btype == 1
                           else ATTR.DIFFUSE_ALBEDO]
            spec = (attrs[mid, ATTR.PHONG_SPECULAR_COLOR] if btype == 1
                    else np.zeros(3))
            inten = (float(attrs[mid, ATTR.PHONG_SPECULAR_INTENSITY][0])
                     if btype == 1 else 0.0)
            f.write(f"{len(tris)} {btype} {f3(albedo)} {f3(emissive[mid])} "
                    f"{f3(spec)} {inten:.9g}\n")
            for t in tris:
                a, b, c = pos[vidx[t, 0]], pos[vidx[t, 1]], pos[vidx[t, 2]]
                na, nb, nc = normals[t, 0], normals[t, 1], normals[t, 2]
                f.write(f"{f3(a)} {f3(b)} {f3(c)} {f3(na)} {f3(nb)} {f3(nc)}\n")


def _block_means(img):
    return np.asarray(img).reshape(
        H // BLOCK, BLOCK, W // BLOCK, BLOCK, 3
    ).mean(axis=(1, 3))


def _render_ours(scene, cam, seed, integrator=tt.Integrator.DIRECT, spp=SPP):
    opts = tt.RenderOptions(
        width=W, height=H, samples_per_pixel=spp, bounces=BOUNCES,
        integrator=integrator, subpixel_jitter=0.5,
        rr_start_bounce=0,  # the reference roulettes every bounce (Terra.c:1081)
        intersector=tt.Intersector.WATERTIGHT,  # reference compile-time default
        samples_per_launch=128,
    )
    film = render(scene, cam, opts, seed=seed)
    return np.asarray(film.acc) / np.asarray(film.samples)[..., None]


# (scene kwargs, our integrator, the reference's kTerraIntegrator* index,
# spp). DIRECT checks NEE + visibility + the diffuse pdf chain; DIRECT_MIS
# additionally checks the power-2 weights, the solid-angle pdf conversion,
# and the same-object BSDF-strategy acceptance (Terra.c:1428-1587); the
# phong case checks the kd/ks energy split, the cosine-power lobe and its
# pdf (TerraPresets.c:66-146) — each against the real compiled
# implementation, the only check that can catch a formula misread shared
# by the port and its NumPy mirror.
_CASES = [
    ({}, tt.Integrator.DIRECT, 1, SPP),
    ({}, tt.Integrator.DIRECT_MIS, 2, 256),
    ({"wall_bsdf": None}, tt.Integrator.DIRECT, 1, 256),  # phong, see below
]


@pytest.mark.parametrize("scene_kw,integrator,ref_integrator,spp", _CASES)
def test_reference_cross_validation(ref_binary, tmp_path, scene_kw, integrator,
                                    ref_integrator, spp):
    if scene_kw.get("wall_bsdf", 0) is None:
        scene_kw = {"wall_bsdf": tt.BSDFType.PHONG}
    scene = tt.scenes.cornell_box(**scene_kw)  # blocks: occlusion + bleed
    cam = tt.scenes.cornell_camera()

    scene_txt = str(tmp_path / "scene.txt")
    _dump_scene(scene, cam, scene_txt)

    out_txt = str(tmp_path / "ref.txt")
    subprocess.run(
        [ref_binary, scene_txt, out_txt, str(W), str(H), str(spp),
         str(BOUNCES), str(ref_integrator), "1234", "0.5"],
        check=True, capture_output=True, timeout=1200,
    )
    ref = np.loadtxt(out_txt, dtype=np.float64).reshape(H, W, 3)

    ours_a = _render_ours(scene, cam, seed=101, integrator=integrator, spp=spp)
    ours_b = _render_ours(scene, cam, seed=707, integrator=integrator, spp=spp)

    rb = _block_means(ref)
    oa = _block_means(ours_a)
    ob = _block_means(ours_b)

    # Self-calibrated Monte-Carlo noise scale: two independent runs of OUR
    # renderer differ by sqrt(2)*sigma per block; the cross difference
    # |ref - mean(ours)| has expected scale sqrt(1.5)*sigma (same spp both
    # sides). A systematic formula error (a missing cos, a pi, a pdf factor)
    # shifts whole regions by >> these bounds.
    d_self = oa - ob
    d_cross = rb - 0.5 * (oa + ob)
    rms_self = float(np.sqrt(np.mean(d_self**2)))
    rms_cross = float(np.sqrt(np.mean(d_cross**2)))
    assert rms_cross < 1.8 * rms_self + 1e-4, (rms_cross, rms_self)
    assert float(np.abs(d_cross).max()) < 3.5 * float(np.abs(d_self).max()) + 1e-3

    # Global energy agreement per channel (catches any uniform scale error
    # far below the block-noise floor because 64 blocks average down)
    ref_mean = rb.mean(axis=(0, 1))
    ours_mean = 0.5 * (oa + ob).mean(axis=(0, 1))
    np.testing.assert_allclose(ours_mean, ref_mean, rtol=0.03, atol=5e-4)
