"""Compiled-kernel smoke gates for REAL TPU hardware (VERDICT r3 weak #4).

The regular suite forces the 8-device virtual CPU mesh, so every Pallas
test runs in interpret mode and the compiled Mosaic artifact is only
exercised by bench.py. This module is the pre-bench smoke: run it ON the
TPU box as

    TERRA_TEST_PLATFORM=tpu python -m pytest tests/test_tpu_smoke.py -q

(~3 min, dominated by two Mosaic compiles). It fails on the bug classes
interpret mode cannot see: scalar-bitcast miscompiles, SMEM layout/budget
violations, DMA synchronization races, and slab-test edge cases that only
manifest under Mosaic's fused arithmetic (the round-3 flat-box and bf16
empty-slot bugs were both caught by exactly this kind of compiled gate).

Every test here self-skips on the CPU mesh, so the default suite is
unaffected.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import terra_tpu as tt

on_tpu = pytest.mark.skipif(
    jax.default_backend() in ("cpu",),
    reason="compiled-kernel smoke needs real TPU (TERRA_TEST_PLATFORM=tpu)",
)


@on_tpu
def test_compiled_kernel_random_rays_match_brute():
    """The bench gate as a pytest: compiled Pallas closest-hit on random
    rays vs brute force (random rays are what caught the flat-box bug —
    camera-ray gates never see walls edge-on)."""
    from terra_tpu import intersect
    from terra_tpu.accel import pallas_traverse as pt

    scene = tt.scenes.courtyard()
    rng = np.random.default_rng(3)
    n = 2048
    lo = np.asarray(scene.bvh.node_min[0])
    hi = np.asarray(scene.bvh.node_max[0])
    o = jnp.asarray(lo + rng.random((n, 3), np.float32) * (hi - lo))
    v = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(v / np.linalg.norm(v, axis=1, keepdims=True))
    hit_k = jax.jit(lambda o, d: pt.raycast(scene, o, d))(o, d)
    ta, tb, tc = scene.geometry.corners()
    hit_b = jax.jit(
        lambda o, d: intersect.raycast_brute(o, d, ta, tb, tc)
    )(o, d)
    hk, hb = np.asarray(hit_k.hit), np.asarray(hit_b.hit)
    assert (hk == hb).all(), f"{int((hk != hb).sum())}/{n} hit mismatches"
    both = hk & hb
    np.testing.assert_allclose(
        np.asarray(hit_k.t)[both], np.asarray(hit_b.t)[both],
        rtol=1e-4, atol=1e-4,
    )


@on_tpu
def test_compiled_paged_kernel_matches_brute():
    """Compiled PAGED-kernel gate (ADVICE r4): the paged path is otherwise
    validated only in interpret mode, yet this toolchain has documented
    interpret-vs-Mosaic divergences (scalar bitcast, static VMEM scalar
    reads, in-loop DMA hangs) that only compiled runs catch. A tiny
    resident_cap forces heavy paging on the courtyard."""
    from terra_tpu import intersect
    from terra_tpu.accel import pallas_traverse as pt

    scene = tt.scenes.courtyard()
    rng = np.random.default_rng(7)
    n = 2048
    lo = np.asarray(scene.bvh.node_min[0])
    hi = np.asarray(scene.bvh.node_max[0])
    o = jnp.asarray(lo + rng.random((n, 3), np.float32) * (hi - lo))
    v = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(v / np.linalg.norm(v, axis=1, keepdims=True))
    ta, tb, tc = scene.geometry.corners()
    # resident_cap 64 pages ~99% of the courtyard's wide tree
    packed = pt.pack_tables_paged(scene.bvh, ta, tb, tc, resident_cap=64)
    hit_k = jax.jit(
        lambda o, d: pt.raycast(scene, o, d, packed=packed)
    )(o, d)
    hit_b = jax.jit(
        lambda o, d: intersect.raycast_brute(o, d, ta, tb, tc)
    )(o, d)
    hk, hb = np.asarray(hit_k.hit), np.asarray(hit_b.hit)
    assert (hk == hb).all(), f"{int((hk != hb).sum())}/{n} paged hit mismatches"
    both = hk & hb
    np.testing.assert_allclose(
        np.asarray(hit_k.t)[both], np.asarray(hit_b.t)[both],
        rtol=1e-4, atol=1e-4,
    )


@on_tpu
def test_compiled_bvh_render_matches_oracle():
    """One small BVH render end-to-end through the compiled kernel vs the
    NumPy oracle (the golden comparison, but on the Mosaic artifact)."""
    from terra_tpu.testing import mirror

    scene = tt.scenes.cornell_box(accelerator=tt.Accelerator.BVH)
    cam = tt.scenes.cornell_camera()
    opts = tt.RenderOptions(width=16, height=16, samples_per_pixel=8,
                            bounces=2, integrator=tt.Integrator.DIRECT,
                            accelerator=tt.Accelerator.BVH)
    film = tt.render(scene, cam, opts, seed=23)
    img_jax = np.asarray(film.mean())
    img_np = mirror.render_mirror(scene, cam, opts, seed=23)
    rel = np.abs(img_jax - img_np) / np.maximum(np.abs(img_np), 1e-2)
    assert (rel > 2e-3).mean() <= 1.2e-2
    assert abs(img_jax.mean() - img_np.mean()) / max(img_np.mean(), 1e-6) < 5e-3
