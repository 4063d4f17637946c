"""Gradient correctness: autodiff vs finite differences (BASELINE.md:
"pixel-grad allclose vs finite-difference"), plus inverse-rendering
convergence on a toy recover task."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import terra_tpu as tt
from terra_tpu import optim
from terra_tpu.ops import rng as rng_mod


def _key(seed=0):
    k0, k1 = rng_mod.key_from_seed(seed)
    return jnp.array([k0, k1], jnp.uint32)


def _loss_for_albedo(scene, cam, opts, target):
    """Scalar loss as a function of the white-wall albedo scalar."""

    def f(albedo_scalar):
        attrs = scene.materials.attrs.at[0, 0, :].set(albedo_scalar)
        s = optim.inject_params(scene, {"attrs": attrs})
        img = optim.render_mean_image(s, cam, opts, _key(), jnp.int32(0), opts.samples_per_pixel)
        return jnp.mean((img - target) ** 2)

    return f


@pytest.fixture(scope="module")
def small():
    scene = tt.scenes.cornell_box()
    cam = tt.scenes.cornell_camera()
    # no roulette / no jitter: keeps the estimator smooth in the params so
    # finite differences are clean
    opts = tt.RenderOptions(width=12, height=12, samples_per_pixel=8, bounces=2,
                            integrator=tt.Integrator.DIRECT, subpixel_jitter=0.0,
                            rr_start_bounce=10)
    img = optim.render_mean_image(scene, cam, opts, _key(1), jnp.int32(0), 8)
    return scene, cam, opts, jnp.asarray(img)


def test_grad_albedo_matches_fd(small):
    scene, cam, opts, target = small
    f = _loss_for_albedo(scene, cam, opts, target * 0.5)
    x0 = jnp.float32(0.73)
    g = float(jax.grad(f)(x0))
    h = 1e-2
    fd = (float(f(x0 + h)) - float(f(x0 - h))) / (2 * h)
    assert np.isfinite(g)
    assert abs(g - fd) < 0.05 * max(abs(fd), 1e-3), (g, fd)


def test_grad_emission_matches_fd(small):
    scene, cam, opts, target = small

    def f(em):
        emissive = scene.materials.emissive.at[3, :].set(em)
        s = optim.inject_params(scene, {"emissive": emissive})
        img = optim.render_mean_image(s, cam, opts, _key(), jnp.int32(0), opts.samples_per_pixel)
        return jnp.mean((img - target * 0.5) ** 2)

    x0 = jnp.float32(15.0)
    g = float(jax.grad(f)(x0))
    h = 1e-1
    fd = (float(f(x0 + h)) - float(f(x0 - h))) / (2 * h)
    assert abs(g - fd) < 0.05 * max(abs(fd), 1e-5), (g, fd)


def test_grad_vertex_positions_finite(small):
    """Vertex-position gradients flow (through the differentiable surface
    recompute) and are finite; the raycast indices are stop-gradiented."""
    scene, cam, opts, target = small

    def f(positions):
        s = optim.inject_params(scene, {"positions": positions})
        img = optim.render_mean_image(s, cam, opts, _key(), jnp.int32(0), opts.samples_per_pixel)
        return jnp.mean((img - target * 0.5) ** 2)

    g = jax.grad(f)(scene.geometry.positions)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0.0


@pytest.mark.parametrize("integrator,tol", [
    (tt.Integrator.DEBUG_DEPTH, 0.01),  # pure geometric hit-recompute path
    (tt.Integrator.DIRECT, 0.03),       # shading-coupled (NEE d^2, cos, basis)
])
def test_grad_vertex_positions_matches_fd(integrator, tol):
    """Finite-difference check of vertex-position gradients on a smooth
    configuration: translate the back wall (object 2) along +z. No jitter,
    no roulette, bounces=0 — the perturbation keeps every sampled ray on
    the same triangle, so the interior gradient (through the differentiable
    hit re-evaluation and the NEE shading terms) is exact and FD-clean.

    What this does NOT cover — by design of the estimator: visibility
    discontinuities (silhouette edges). The raycast's discrete hit choice
    is stop-gradiented, so gradients through occlusion-boundary motion are
    zero; see optim.py's module docstring for the documented limitation."""
    scene = tt.scenes.cornell_box(with_blocks=False)
    cam = tt.scenes.cornell_camera()
    opts = tt.RenderOptions(width=12, height=12, samples_per_pixel=4, bounces=0,
                            integrator=integrator, subpixel_jitter=0.0,
                            rr_start_bounce=10)
    target = optim.render_mean_image(scene, cam, opts, _key(1), jnp.int32(0), 4)
    wall_tris = np.asarray(scene.geometry.obj_id) == 2
    rows = np.unique(np.asarray(scene.geometry.tri_vidx)[wall_tris])

    def f(dz):
        pos = scene.geometry.positions.at[rows, 2].add(dz)
        s = optim.inject_params(scene, {"positions": pos})
        img = optim.render_mean_image(s, cam, opts, _key(), jnp.int32(0), 4)
        return jnp.mean((img - target * 0.5) ** 2)

    x0 = jnp.float32(0.0)
    g = float(jax.grad(f)(x0))
    h = 2.0  # box units (~556-wide box): small vs geometry, large vs f32 noise
    fd = (float(f(x0 + h)) - float(f(x0 - h))) / (2 * h)
    assert np.isfinite(g)
    assert abs(g - fd) < tol * max(abs(fd), 1e-7), (g, fd)


def test_vertex_optimization_refits_bvh():
    """Optimizing vertex positions on a BVH scene refits the AABBs each
    step: after recovery the tree still contains every (moved) triangle."""
    import dataclasses

    scene = tt.scenes.random_triangles(200, seed=3, accelerator=tt.Accelerator.BVH)
    cam = tt.scenes.cornell_camera()
    cam = dataclasses.replace(
        cam,
        position=jnp.asarray([0.0, 0.0, -4.0]),
        direction=jnp.asarray([0.0, 0.0, 1.0]),
    )
    opts = tt.RenderOptions(width=8, height=8, samples_per_pixel=2, bounces=1,
                            integrator=tt.Integrator.SIMPLE, rr_start_bounce=8)
    key = _key()
    target = optim.render_mean_image(scene, cam, opts, key, jnp.int32(0), 2)
    # perturb and recover a few steps; the loop must keep the BVH valid
    pos0 = scene.geometry.positions + 0.05
    scene0 = dataclasses.replace(
        scene, geometry=dataclasses.replace(scene.geometry, positions=pos0)
    )
    recovered, losses = optim.recover(
        scene0, cam, opts, jax.lax.stop_gradient(target),
        fields=("positions",), steps=3, learning_rate=1e-2, seed=5,
    )
    assert np.isfinite(losses).all()
    # AABB containment of the final tree vs the final positions
    bvh = recovered.bvh
    pos = np.asarray(recovered.geometry.positions)
    vidx = np.asarray(recovered.geometry.tri_vidx)
    ni = bvh.num_internal
    bmin = np.asarray(bvh.node_min)
    bmax = np.asarray(bvh.node_max)
    leaf_tri = np.asarray(bvh.leaf_tri)
    for c in range(bvh.num_leaves):
        corners = pos[vidx[leaf_tri[c]]].reshape(-1, 3)
        assert (corners.min(0) >= bmin[ni + c] - 1e-4).all()
        assert (corners.max(0) <= bmax[ni + c] + 1e-4).all()


def _checker_scene():
    """Cornell box with the white-wall albedo driven by a checker atlas
    (same construction as test_golden.test_golden_textured)."""
    import dataclasses

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
    return dataclasses.replace(
        scene,
        textures=atlas,
        materials=dataclasses.replace(
            scene.materials, attr_tex=jnp.asarray(attr_tex), tex_slots=(0,)
        ),
    )


def test_grad_texture_data_matches_fd():
    """Gradients flow into TextureAtlas.data through the bilinear gather
    (VERDICT r3 missing #5): FD check on one texel's red channel."""
    scene = _checker_scene()
    cam = tt.scenes.cornell_camera()
    opts = tt.RenderOptions(width=12, height=12, samples_per_pixel=8, bounces=2,
                            integrator=tt.Integrator.DIRECT, subpixel_jitter=0.0,
                            rr_start_bounce=10)
    target = optim.render_mean_image(scene, cam, opts, _key(1), jnp.int32(0), 8)

    def f(v):
        data = scene.textures.data.at[0, 3, 4, 0].set(v)
        s = optim.inject_params(scene, {"textures": data})
        img = optim.render_mean_image(s, cam, opts, _key(), jnp.int32(0), 8)
        return jnp.mean((img - target * 0.5) ** 2)

    x0 = jnp.float32(float(scene.textures.data[0, 3, 4, 0]))
    g = float(jax.grad(f)(x0))
    h = 5e-2
    fd = (float(f(x0 + h)) - float(f(x0 - h))) / (2 * h)
    assert np.isfinite(g) and abs(g) > 0.0
    assert abs(g - fd) < 0.05 * max(abs(fd), 1e-5), (g, fd)


def test_recover_texture_texel():
    """Inverse rendering through the atlas: perturb a texel block, recover
    it by descending on 'textures' (exercises extract/inject + clip)."""
    scene = _checker_scene()
    cam = tt.scenes.cornell_camera()
    opts = tt.RenderOptions(width=10, height=10, samples_per_pixel=8, bounces=2,
                            integrator=tt.Integrator.DIRECT, rr_start_bounce=10)
    target = optim.render_mean_image(scene, cam, opts, _key(7), jnp.int32(0), 8)
    import dataclasses

    data0 = scene.textures.data * 0.5  # uniformly dimmed start
    scene0 = dataclasses.replace(
        scene, textures=dataclasses.replace(scene.textures, data=data0)
    )
    recovered, losses = optim.recover(
        scene0, cam, opts, target, fields=("textures",), steps=30,
        learning_rate=5e-2, seed=7,
    )
    assert losses[-1] < losses[0] * 0.35, losses[:: max(len(losses) // 8, 1)]


def test_grad_camera_matches_fd():
    """Camera-pose gradients (optim.PARAM_FIELDS 'camera'): FD check of the
    loss derivative w.r.t. a camera x-translation."""
    import dataclasses

    scene = tt.scenes.cornell_box(with_blocks=False)
    # narrow fov straight at the back wall: camera motion slides every hit
    # point smoothly on one plane (no pixels cross silhouette/corner edges,
    # which the stop-gradiented raycast cannot differentiate through)
    cam = dataclasses.replace(tt.scenes.cornell_camera(),
                              fov_deg=jnp.asarray(12.0, jnp.float32))
    # bounces=0: at bounce 1 the (fixed-random) continuation rays slide
    # across the light-quad edge as the camera moves — a visibility
    # discontinuity the stop-gradiented raycast cannot carry; bounce 0's
    # emissive + NEE terms are smooth in the camera pose
    opts = tt.RenderOptions(width=12, height=12, samples_per_pixel=4, bounces=0,
                            integrator=tt.Integrator.DIRECT, subpixel_jitter=0.0,
                            rr_start_bounce=10)
    target = optim.render_mean_image(scene, cam, opts, _key(1), jnp.int32(0), 4)

    def f(dx):
        params = optim.extract_params(scene, ("camera",), cam=cam)
        params["camera"]["position"] = params["camera"]["position"] + jnp.asarray(
            [dx, 0.0, 0.0], jnp.float32
        )
        cam_p = optim.inject_camera(cam, params)
        img = optim.render_mean_image(scene, cam_p, opts, _key(), jnp.int32(0), 4)
        return jnp.mean((img - target * 0.5) ** 2)

    x0 = jnp.float32(0.0)
    g = float(jax.grad(f)(x0))
    h = 2.0  # box units; rays stay on the same triangles (empty box)
    fd = (float(f(x0 + h)) - float(f(x0 - h))) / (2 * h)
    assert np.isfinite(g) and abs(g) > 0.0
    assert abs(g - fd) < 0.05 * max(abs(fd), 1e-7), (g, fd)


def test_recover_camera_pose_x():
    """Recover a 20-unit camera x-translation by gradient descent against a
    checker-textured wall (strong, smooth image signal). Scope notes: the
    camera group supports partial dicts because position lives at scene
    scale ~500 while direction/fov are unit-scale (one Adam lr cannot serve
    all three), and full 3-axis pose recovery at thumbnail resolution is
    ill-conditioned — aliasing kinks in the 16 x 16 / 4 spp loss surface
    create spurious local slopes along y/z. The FD test above is the
    correctness evidence; this test shows the gradient is *usable*."""
    import dataclasses
    import optax

    scene = _checker_scene()
    cam = dataclasses.replace(tt.scenes.cornell_camera(),
                              fov_deg=jnp.asarray(14.0, jnp.float32))
    opts = tt.RenderOptions(width=16, height=16, samples_per_pixel=4, bounces=0,
                            integrator=tt.Integrator.DIRECT, subpixel_jitter=0.5,
                            rr_start_bounce=10)
    target = optim.render_mean_image(scene, cam, opts, _key(9), jnp.int32(0), 4)

    def f(dx):
        params = {"camera": {
            "position": cam.position + jnp.asarray([1.0, 0.0, 0.0]) * dx
        }}
        cam_p = optim.inject_camera(cam, params)
        img = optim.render_mean_image(scene, cam_p, opts, _key(9), jnp.int32(0), 4)
        return jnp.mean((img - target) ** 2)

    gradf = jax.jit(jax.value_and_grad(f))
    dx = jnp.float32(20.0)
    opt = optax.adam(1.0)
    st = opt.init(dx)
    loss0 = None
    for i in range(50):
        loss, g = gradf(dx)
        if i == 0:
            loss0 = float(loss)
        up, st = opt.update(g, st, dx)
        dx = optax.apply_updates(dx, up)
    assert float(loss) < loss0 * 0.1, (loss0, float(loss))
    assert abs(float(dx)) < 3.0, float(dx)


def test_grad_replay_exact(small):
    """Same key -> backward replays the exact same RNG decisions: gradient
    is deterministic across calls."""
    scene, cam, opts, target = small
    f = _loss_for_albedo(scene, cam, opts, target * 0.5)
    g1 = float(jax.grad(f)(jnp.float32(0.7)))
    g2 = float(jax.grad(f)(jnp.float32(0.7)))
    assert g1 == g2


def test_recover_albedo_descends():
    """Toy inverse rendering: perturb the white-wall albedo, recover it."""
    scene = tt.scenes.cornell_box(with_blocks=False)
    cam = tt.scenes.cornell_camera()
    opts = tt.RenderOptions(width=10, height=10, samples_per_pixel=8, bounces=2,
                            integrator=tt.Integrator.DIRECT, rr_start_bounce=10)
    target = optim.render_mean_image(scene, cam, opts, _key(7), jnp.int32(0), 8)

    # wrong starting albedo
    attrs0 = scene.materials.attrs.at[0, 0, :].set(jnp.asarray([0.3, 0.3, 0.3]))
    scene0 = optim.inject_params(scene, {"attrs": attrs0})
    recovered, losses = optim.recover(
        scene0, cam, opts, target, fields=("attrs",), steps=40, learning_rate=5e-2, seed=7
    )
    assert losses[-1] < losses[0] * 0.2, losses[:: max(len(losses) // 8, 1)]
    rec = np.asarray(recovered.materials.attrs)[0, 0]
    assert np.abs(rec - 0.73).max() < 0.15, rec
