"""Math kernel tests: frames, reflection, normalization."""
import numpy as np
import jax.numpy as jnp

from terra_tpu.ops import math3


def _rand_unit(n, seed=0):
    r = np.random.default_rng(seed).normal(size=(n, 3)).astype(np.float32)
    return r / np.linalg.norm(r, axis=-1, keepdims=True)


def test_basis_orthonormal():
    n = jnp.asarray(_rand_unit(1024))
    t, b = math3.build_basis(n)
    np.testing.assert_allclose(np.asarray(math3.dot(t, n)), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(math3.dot(b, n)), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(math3.dot(t, b)), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(math3.length(t)), 1, atol=1e-5)
    np.testing.assert_allclose(np.asarray(math3.length(b)), 1, atol=1e-5)
    # right layout: cross(n, t) == b (column order (t, n, b), TerraMath.inl:265)
    np.testing.assert_allclose(np.asarray(math3.cross(n, t)), np.asarray(b), atol=1e-5)


def test_to_world_roundtrip():
    n = jnp.asarray(_rand_unit(256, 1))
    t, b = math3.build_basis(n)
    v = jnp.asarray(_rand_unit(256, 2))
    local = math3.to_local(v, t, n, b)
    back = math3.to_world(local, t, n, b)
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-5)


def test_reflect():
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    wo = math3.normalize(jnp.asarray([[1.0, 1.0, 0.0]]))
    r = math3.reflect(wo, n)
    np.testing.assert_allclose(np.asarray(r), [[-0.7071067, 0.7071067, 0.0]], atol=1e-5)


def test_luminance_and_max3():
    c = jnp.asarray([[1.0, 2.0, 3.0]])
    assert abs(float(math3.max3(c)[0]) - 3.0) < 1e-6
    assert float(math3.luminance(jnp.asarray([1.0, 1.0, 1.0]))) - 1.0 < 1e-4
