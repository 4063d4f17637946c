"""Sharded rendering tests on the virtual 8-device CPU mesh (SURVEY.md §4d):
sharding-invariance of the image, sample-axis psum, and the driver's
multi-chip dry run."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import terra_tpu as tt
from terra_tpu.ops import rng as rng_mod
from terra_tpu.parallel.mesh import make_mesh, render_chunk_sharded, render_sharded
from terra_tpu.render import render_chunk


@pytest.fixture(scope="module")
def setup():
    scene = tt.scenes.cornell_box()
    cam = tt.scenes.cornell_camera()
    opts = tt.RenderOptions(width=16, height=16, samples_per_pixel=8, bounces=2,
                            integrator=tt.Integrator.DIRECT, subpixel_jitter=0.5)
    k0, k1 = rng_mod.key_from_seed(0)
    key = jnp.array([k0, k1], jnp.uint32)
    ref = np.asarray(render_chunk(scene, cam, opts, key, jnp.int32(0), 8))
    return scene, cam, opts, key, ref


def test_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_matches_single_device(setup, shape):
    """Counter-based RNG + global pixel ids => bit-comparable images for
    every mesh factorization."""
    scene, cam, opts, key, ref = setup
    mesh = make_mesh(shape)
    acc = np.asarray(render_chunk_sharded(scene, cam, opts, key, jnp.int32(0), 8, mesh))
    np.testing.assert_allclose(acc, ref, rtol=1e-4, atol=1e-4)


def test_render_sharded_film(setup):
    scene, cam, opts, key, ref = setup
    mesh = make_mesh((8, 1))
    film = render_sharded(scene, cam, opts, mesh, seed=0)
    assert int(np.asarray(film.samples).max()) == 8
    np.testing.assert_allclose(np.asarray(film.acc), ref, rtol=1e-4, atol=1e-4)


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    out.block_until_ready()
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("n", [4, 8])
def test_graft_dryrun_multichip(n):
    import __graft_entry__ as ge

    ge.dryrun_multichip(n)


def test_band_sharded_matches_whole_frame(setup):
    """Row-band rendering (pod 4k path: bounds the live wavefront) covers
    the frame band by band with GLOBAL pixel ids, so the assembled image
    equals the whole-frame render bit-for-bit per band."""
    from terra_tpu.parallel.mesh import render_band_sharded

    scene, cam, opts, key, ref = setup
    mesh = make_mesh((8, 1))
    acc = np.zeros_like(ref)
    band = 8  # two bands of 8 rows over 8 row-shards -> 1 row per device
    for b0 in range(0, opts.height, band):
        a = np.asarray(render_band_sharded(scene, cam, opts, key, jnp.int32(0),
                                           jnp.int32(b0), 8, band, mesh))
        acc[b0:b0 + band] += a
    np.testing.assert_allclose(acc, ref, rtol=1e-4, atol=1e-4)
