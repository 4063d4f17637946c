"""Two-phase subtree-compacted traversal (accel/compact.py): interpret-
mode exactness vs the classic wide kernel, covering per-way start links
(wide-node and singleton-leaf subtree roots), t_max-seeded rounds, tail
rounds, and miss rays."""
import numpy as np
import jax.numpy as jnp

import terra_tpu as tt
from terra_tpu.accel import compact, pallas_traverse
from terra_tpu.intersect import T_FAR


def test_compact_matches_classic():
    scene = tt.scenes.random_triangles(3000, seed=5,
                                       accelerator=tt.Accelerator.BVH)
    bvh = scene.bvh
    packed = pallas_traverse.pack_tables_wide(bvh, *scene.geometry.corners(),
                                              box_enc="f32")
    fr = compact.build_frontier(bvh, max_leaves=16)
    assert int(fr.roots.shape[0]) > 4, "cut should produce several subtrees"

    rng = np.random.default_rng(3)
    n = 2048
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d_ = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d_ / np.linalg.norm(d_, axis=-1, keepdims=True))

    ref = pallas_traverse.raycast(scene, o, d, packed=packed,
                                  interpret=True, sort_rays=False)
    got = compact.raycast_compact(bvh, packed, fr, o, d, interpret=True)

    h1, h2 = np.asarray(ref.hit), np.asarray(got.hit)
    np.testing.assert_array_equal(h1, h2)
    both = h1 & h2
    np.testing.assert_allclose(np.asarray(ref.t)[both],
                               np.asarray(got.t)[both], rtol=1e-5)
    # exact-t ties across subtrees may pick a different triangle
    same = (np.asarray(ref.tri)[both] == np.asarray(got.tri)[both])
    assert same.mean() > 0.99


def test_frontier_partitions_leaves():
    scene = tt.scenes.random_triangles(1500, seed=7,
                                       accelerator=tt.Accelerator.BVH)
    bvh = scene.bvh
    fr = compact.build_frontier(bvh, max_leaves=8)
    W = int(bvh.num_wide)
    roots = np.asarray(fr.roots)
    # every binary leaf is reachable from exactly one frontier root
    child = np.asarray(bvh.wide_child)
    seen = np.zeros(int(bvh.num_leaves), np.int32)
    for r in roots:
        if r >= W:
            seen[r - W] += 1
            continue
        stack = [int(r)]
        while stack:
            nd = stack.pop()
            for c in child[nd]:
                if c < 0:
                    continue
                if c >= W:
                    seen[c - W] += 1
                else:
                    stack.append(int(c))
    assert (seen == 1).all()
