"""Film accumulation + tonemap operator tests (Terra.c:569-630 parity)."""
import numpy as np
import jax.numpy as jnp

from terra_tpu import Film, Tonemap, develop, tonemap


def test_film_accumulate_and_mean():
    f = Film.create(4, 2)
    f = Film(acc=f.acc + 2.0, samples=f.samples + 4)
    np.testing.assert_allclose(np.asarray(f.mean()), 0.5)


def test_tonemap_none_is_exposure_only():
    c = jnp.asarray([[0.5, 1.0, 2.0]])
    out = tonemap(c, Tonemap.NONE, exposure=2.0)
    np.testing.assert_allclose(np.asarray(out), [[1.0, 2.0, 4.0]])


def test_tonemap_linear_gamma():
    c = jnp.asarray([[0.25]])
    out = tonemap(jnp.broadcast_to(c, (1, 3)), Tonemap.LINEAR, gamma=2.0)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)


def test_tonemap_reinhard():
    c = jnp.ones((1, 3))
    out = tonemap(c, Tonemap.REINHARD, gamma=1.0)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)


def test_tonemap_uncharted2_monotone_and_bounded():
    x = jnp.linspace(0.0, 20.0, 64)[:, None] * jnp.ones((1, 3))
    out = np.asarray(tonemap(x, Tonemap.UNCHARTED2))
    assert (np.diff(out[:, 0]) >= -1e-6).all()
    assert out.max() <= 1.5


def test_develop():
    f = Film(acc=jnp.full((2, 2, 3), 8.0), samples=jnp.full((2, 2), 4, jnp.int32))
    img = develop(f, Tonemap.NONE)
    np.testing.assert_allclose(np.asarray(img), 2.0)
