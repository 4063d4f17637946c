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


def test_chunked_grad_allreduce_matches_unchunked(setup):
    """grad_chunks>1 (per-chunk psum right after each chunk's backward —
    the overlap-ready form of the north star's gradient all-reduce) must
    produce the same gradients as the single end-of-backward psum: the
    shared-cotangent VJP decomposition is exact."""
    import optax

    import terra_tpu as tt
    from terra_tpu import optim
    from terra_tpu.ops import rng as rng_mod
    from terra_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((4, 2))
    scene = tt.scenes.cornell_box()
    cam = tt.scenes.cornell_camera()
    opts = tt.RenderOptions(width=8, height=8, samples_per_pixel=8, bounces=1,
                            integrator=tt.Integrator.DIRECT)
    k0, k1 = rng_mod.key_from_seed(3)
    key = jnp.array([k0, k1], jnp.uint32)
    target = jnp.zeros((8, 8, 3), jnp.float32)
    optimizer = optax.sgd(1e-2)  # sgd: params after 1 step expose raw grads
    params = optim.extract_params(scene, ("attrs", "emissive"))

    outs = {}
    for chunks in (1, 4):
        state = optim.TrainState(params, optimizer.init(params), jnp.int32(0))
        step = optim.make_train_step_sharded(cam, opts, target, optimizer,
                                             mesh, grad_chunks=chunks)
        st, loss = step(state, scene, key)
        outs[chunks] = (st.params, float(loss))

    assert np.isclose(outs[1][1], outs[4][1], rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(outs[1][0]),
                    jax.tree_util.tree_leaves(outs[4][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)

    # absolute correctness: sharded grads == the unsharded ground truth
    # (sgd lr 1e-2: params after one step expose grads; this is what
    # caught the psum-transpose 2x scaling of the r<=3 formulation)
    loss_fn = optim.make_loss_fn(cam, opts, target)
    g_ref = jax.grad(loss_fn)(params, scene, key, jnp.int32(0))
    for (name, p1), p0 in zip(sorted(outs[1][0].items()),
                              (params[k] for k in sorted(params))):
        g_sh = (np.asarray(p0) - np.asarray(p1)) / 1e-2
        np.testing.assert_allclose(g_sh, np.asarray(g_ref[name]),
                                   rtol=2e-3, atol=2e-5)
