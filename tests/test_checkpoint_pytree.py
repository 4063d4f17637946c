"""Pytree checkpoint roundtrip (optimizer/scene state persistence)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

import terra_tpu as tt
from terra_tpu import optim
from terra_tpu.checkpoint import load_pytree, save_pytree


def test_pytree_roundtrip_scene_params(tmp_path):
    scene = tt.scenes.cornell_box()
    params = optim.extract_params(scene, ("attrs", "emissive"))
    p = str(tmp_path / "params.npz")
    save_pytree(p, params)
    like = jax.tree_util.tree_map(jnp.zeros_like, params)
    back = load_pytree(p, like)
    for k in params:
        np.testing.assert_allclose(np.asarray(back[k]), np.asarray(params[k]))


def test_pytree_roundtrip_optimizer_state(tmp_path):
    scene = tt.scenes.cornell_box()
    params = optim.extract_params(scene, ("attrs",))
    opt = optax.adam(1e-2)
    state = opt.init(params)
    # advance one step so the state is non-trivial
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    _, state = opt.update(grads, state, params)
    p = str(tmp_path / "opt.npz")
    save_pytree(p, state)
    like = jax.tree_util.tree_map(jnp.zeros_like, state)
    back = load_pytree(p, like)
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
