"""Golden-image tests: JAX renderer vs the independent NumPy CPU mirror.

BASELINE.md forward-correctness config: image allclose vs fixed-seed CPU
reference render. Both implementations draw bit-identical threefry numbers,
so images agree up to f32 reassociation; rare lanes may flip a discrete
decision (roulette/visibility) on an ulp boundary, so we require near-total
lane agreement plus a tight mean-image tolerance.
"""
import numpy as np
import pytest

import terra_tpu as tt
from terra_tpu.testing import mirror


def _compare(opts, seed=3, tol=2e-3, flip_budget=8e-3):
    # flip_budget: shadow rays that land on the shared edge of coplanar
    # light triangles tie-break differently in f32 between the two
    # implementations (same-triangle visibility check, Terra.c:1403); the
    # aggregate-energy assertion below keeps the bound honest.
    scene = tt.scenes.cornell_box()
    cam = tt.scenes.cornell_camera()
    film = tt.render(scene, cam, opts, seed=seed)
    img_jax = np.asarray(film.mean())
    img_np = mirror.render_mirror(scene, cam, opts, seed=seed)
    _assert_twin_match(img_jax, img_np, tol, flip_budget, 5e-3)


def _assert_twin_match(img_jax, img_np, tol, flip_budget, energy_tol):
    """Same-seed twin comparison (VERDICT r3 weak #6 tightening): lanes
    that draw the same randoms and take the same discrete decisions agree
    to f32 reassociation (measured ~7e-6 max on the BVH goldens), so ANY
    pixel above 1e-4 is a discrete flip and counts against the sparse
    flip budget — a systematic drift that nudged every pixel by ~1e-3
    (invisible to the old tol-only check) now fails immediately."""
    diff = np.abs(img_jax - img_np)
    scale = np.maximum(np.abs(img_np), 1e-2)
    rel = diff / scale
    for t in (tol, 1e-4):
        frac_bad = (rel > t).mean()
        assert frac_bad <= flip_budget, (
            f"{frac_bad:.4%} of pixels deviate above {t:g}; max rel "
            f"{rel.max():.3e}, mean jax {img_jax.mean():.4f} vs np "
            f"{img_np.mean():.4f}"
        )
    # aggregate energy must agree tightly even when single lanes flip
    assert abs(img_jax.mean() - img_np.mean()) / max(img_np.mean(), 1e-6) < energy_tol


@pytest.mark.parametrize("integrator", [tt.Integrator.SIMPLE, tt.Integrator.DIRECT, tt.Integrator.DIRECT_MIS])
def test_golden_cornell(integrator):
    opts = tt.RenderOptions(
        width=24, height=24, samples_per_pixel=8, bounces=3,
        integrator=integrator, subpixel_jitter=0.5,
    )
    _compare(opts)


def test_golden_phong():
    scene = tt.scenes.cornell_box(wall_bsdf=tt.BSDFType.PHONG)
    cam = tt.scenes.cornell_camera()
    opts = tt.RenderOptions(width=16, height=16, samples_per_pixel=8, bounces=2,
                            integrator=tt.Integrator.DIRECT)
    film = tt.render(scene, cam, opts, seed=5)
    img_jax = np.asarray(film.mean())
    img_np = mirror.render_mirror(scene, cam, opts, seed=5)
    # phong's lobe roulette doubles the discrete decisions per bounce, so
    # the ulp-boundary flip rate is higher than the diffuse cases
    _assert_twin_match(img_jax, img_np, 2e-3, 1.2e-2, 5e-3)


def _compare_scene(scene, opts, seed=3, tol=2e-3, flip_budget=1.2e-2, energy_tol=5e-3):
    cam = tt.scenes.cornell_camera()
    film = tt.render(scene, cam, opts, seed=seed)
    img_jax = np.asarray(film.mean())
    img_np = mirror.render_mirror(scene, cam, opts, seed=seed)
    _assert_twin_match(img_jax, img_np, tol, flip_budget, energy_tol)


def test_golden_ggx_mis():
    """GGX walls under the MIS integrator vs the oracle (VERDICT r1 item 4)."""
    scene = tt.scenes.cornell_box(wall_bsdf=tt.BSDFType.GGX)
    opts = tt.RenderOptions(width=16, height=16, samples_per_pixel=8, bounces=2,
                            integrator=tt.Integrator.DIRECT_MIS)
    _compare_scene(scene, opts, seed=11)


def test_golden_disney():
    """Disney principled block (all lobes parameterized) vs the oracle."""
    import dataclasses
    import jax.numpy as jnp

    scene = tt.scenes.cornell_box(block_bsdf=tt.BSDFType.DISNEY)
    attrs = np.asarray(scene.materials.attrs).copy()
    # slot layout: base_color; [specular, tint]; [sheen, tint];
    # [clearcoat, gloss]; [metal, rough]; [aniso, subsurface]
    attrs[4, 0] = (0.7, 0.3, 0.2)
    attrs[4, 1, :2] = (0.5, 0.2)
    attrs[4, 2, :2] = (0.3, 0.5)
    attrs[4, 3, :2] = (0.5, 0.7)
    attrs[4, 4, :2] = (0.3, 0.5)
    attrs[4, 5, :2] = (0.3, 0.2)
    scene = dataclasses.replace(
        scene,
        materials=dataclasses.replace(scene.materials, attrs=jnp.asarray(attrs)),
    )
    opts = tt.RenderOptions(width=16, height=16, samples_per_pixel=8, bounces=2,
                            integrator=tt.Integrator.DIRECT)
    _compare_scene(scene, opts, seed=13)


@pytest.mark.parametrize("integrator", [tt.Integrator.DIRECT, tt.Integrator.DIRECT_MIS])
def test_golden_env_nee(integrator):
    """Environment next-event estimation vs the oracle twin."""
    import dataclasses
    import jax.numpy as jnp

    scene = tt.scenes.cornell_box(light_emission=4.0)
    scene = dataclasses.replace(scene, env_value=jnp.asarray([0.4, 0.5, 0.7], jnp.float32))
    opts = tt.RenderOptions(width=16, height=16, samples_per_pixel=8, bounces=2,
                            integrator=integrator, env_on_miss=True, env_nee=True)
    _compare_scene(scene, opts, seed=17)


def test_golden_textured():
    """Texture-driven wall albedo (checker, bilinear) vs the oracle twin."""
    import dataclasses
    import jax.numpy as jnp

    scene = tt.scenes.cornell_box()
    res = 8
    yy, xx = np.mgrid[0:res, 0:res]
    checker = np.where(((xx + yy) % 2 == 0)[..., None],
                       np.asarray([0.8, 0.7, 0.2], np.float32),
                       np.asarray([0.2, 0.3, 0.8], np.float32)).astype(np.float32)
    atlas = tt.scene.TextureAtlas(
        data=jnp.asarray(checker[None]),
        size=jnp.asarray([[res, res]], jnp.int32),
        filter=jnp.asarray([1], jnp.int32),   # bilinear
        address=jnp.asarray([0], jnp.int32),  # wrap
    )
    attr_tex = np.asarray(scene.materials.attr_tex).copy()
    attr_tex[0, 0] = 0  # white-wall diffuse albedo <- checker
    # tex_slots is static pytree metadata (like types_present): editing
    # attr_tex without re-committing must update it in lockstep
    scene = dataclasses.replace(
        scene,
        textures=atlas,
        materials=dataclasses.replace(
            scene.materials, attr_tex=jnp.asarray(attr_tex), tex_slots=(0,)
        ),
    )
    opts = tt.RenderOptions(width=16, height=16, samples_per_pixel=8, bounces=2,
                            integrator=tt.Integrator.DIRECT)
    _compare_scene(scene, opts, seed=19)


@pytest.mark.parametrize("integrator", [tt.Integrator.DIRECT, tt.Integrator.DIRECT_MIS])
def test_golden_bvh_path(integrator):
    """The full BVH render path (packet traversal + seeded-t occlusion
    queries) lane-matches the brute-force NumPy oracle: traversal must be
    an exact closest-hit, not an approximation."""
    scene = tt.scenes.cornell_box(accelerator=tt.Accelerator.BVH)
    assert scene.bvh is not None
    opts = tt.RenderOptions(width=16, height=16, samples_per_pixel=8, bounces=2,
                            integrator=integrator,
                            accelerator=tt.Accelerator.BVH)
    _compare_scene(scene, opts, seed=23)


def test_golden_sampling_methods():
    for method in [tt.SamplingMethod.STRATIFIED, tt.SamplingMethod.HALTON]:
        opts = tt.RenderOptions(
            width=12, height=12, samples_per_pixel=4, bounces=1,
            integrator=tt.Integrator.SIMPLE, subpixel_jitter=1.0,
            sampling_method=method,
        )
        _compare(opts, seed=9)
