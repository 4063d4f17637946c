"""Metric-3s lever (VERDICT r3 next #3): sort bounce rays by the PARENT
hit's position in the BVH instead of a fresh spatial key.

Rationale: a bounce ray's traversal is rooted at its origin's surface;
rays leaving the same leaf (or the same wide node) climb/descend the same
part of the tree, so grouping them puts hierarchy-ALIGNED rays in one
packet — the round-3 treelet FIRST-DESCENT key failed because it probed
the camera-facing tree top, which scrambles already-coherent groups; the
parent-hit key uses where the ray actually STARTS.

Measured keys (242k courtyard, cosine first-bounce batch, the bench 3s
config):
  octant       — baseline (direction octant + origin morton)
  leaf+oct     — parent leaf id major, direction octant minor
  leaf+dir3    — parent leaf id major, 3-bit/axis direction minor
  wide+dir3    — parent WIDE-NODE id major (4 leaves/group), dir3 minor
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import terra_tpu as tt  # noqa: E402
from terra_tpu import camera as camera_mod, intersect  # noqa: E402
from terra_tpu.accel import pallas_traverse as pt  # noqa: E402
from terra_tpu.accel import traverse as xla_traverse  # noqa: E402
from terra_tpu.ops import math3  # noqa: E402
from terra_tpu.surface import build_shade_tables, surface_init  # noqa: E402


def main():
    scene = tt.scenes.courtyard()
    bvh = scene.bvh
    cam = tt.scenes.courtyard_camera()
    corners = scene.geometry.corners()
    packed = pt.pack_tables_auto(bvh, *corners)

    n = 1 << 20
    side = int(np.sqrt(n))
    px, py = jnp.meshgrid(jnp.arange(side), jnp.arange(side))
    px = px.reshape(-1).astype(jnp.float32)
    py = py.reshape(-1).astype(jnp.float32)
    zeros = jnp.zeros_like(px)
    o, d = camera_mod.generate_rays(cam, side, side, px, py, 0.0, zeros, zeros)

    hit0 = pt.raycast(scene, o, d, packed=packed)
    tables = build_shade_tables(scene)
    surf = jax.jit(lambda: surface_init(
        scene, tables, o + d * intersect.RAY_OFFSET_DIR, d, hit0.tri))()
    rb = np.random.default_rng(12)
    e1 = jnp.asarray(rb.random(n, np.float32))
    e2 = jnp.asarray(rb.random(n, np.float32))
    st = jnp.sqrt(jnp.maximum(1.0 - e1, 0.0))
    phi = np.float32(2.0 * np.pi) * e2
    nrm = surf.normal
    t_ax = math3.normalize(jnp.cross(nrm, jnp.asarray([0.12, 0.98, 0.17])))
    b_ax = jnp.cross(nrm, t_ax)
    d_s = math3.normalize(
        (st * jnp.cos(phi))[:, None] * t_ax + (st * jnp.sin(phi))[:, None] * b_ax
        + jnp.sqrt(e1)[:, None] * nrm)
    o_s = surf.point + nrm * np.float32(1e-4)
    parent_tri = hit0.tri

    # tri -> leaf / wide-node maps (host, once per build)
    leaf_tri = np.asarray(bvh.leaf_tri)  # (C, L)
    T = int(scene.geometry.tri_vidx.shape[0])
    leaf_of_tri = np.zeros(T, np.int32)
    for li in range(leaf_tri.shape[0]):
        leaf_of_tri[leaf_tri[li]] = li
    leaf_of_tri = jnp.asarray(leaf_of_tri)
    # leaf -> containing wide node: scan wide_child for leaf entries
    wc = np.asarray(bvh.wide_child)  # (W, 4): >= num_wide means leaf
    wide_of_leaf = np.zeros(bvh.num_leaves, np.int32)
    leaf_slots = wc >= bvh.num_wide
    wide_ids, slot_ids = np.nonzero(leaf_slots)
    wide_of_leaf[wc[wide_ids, slot_ids] - bvh.num_wide] = wide_ids
    wide_of_leaf = jnp.asarray(wide_of_leaf)

    def octant_bits(dd):
        return ((dd[:, 0] > 0).astype(jnp.uint32)
                | ((dd[:, 1] > 0).astype(jnp.uint32) << 1)
                | ((dd[:, 2] > 0).astype(jnp.uint32) << 2))

    def dir3_bits(dd):
        dn = (dd + 1.0) * 0.5
        return xla_traverse._morton3_bits(dn * 8.0, 3)  # 9 bits

    def keys_for(kind, o, d, tri):
        if kind == "octant":
            return xla_traverse._sort_keys(o, d, bvh.node_min[0],
                                           bvh.node_max[0], mode="octant")
        leaf = leaf_of_tri[tri].astype(jnp.uint32)
        if kind == "leaf+oct":
            return (leaf << jnp.uint32(3)) | octant_bits(d)
        if kind == "leaf+dir3":
            return (leaf << jnp.uint32(9)) | dir3_bits(d)
        if kind == "wide+dir3":
            wide = wide_of_leaf[leaf_of_tri[tri]].astype(jnp.uint32)
            return (wide << jnp.uint32(9)) | dir3_bits(d)
        if kind == "leaf+dir4":
            dn = (d + 1.0) * 0.5
            return (leaf << jnp.uint32(12)) | xla_traverse._morton3_bits(dn * 16.0, 4)
        if kind == "tri+dir3":
            return (tri.astype(jnp.uint32) << jnp.uint32(9)) | dir3_bits(d)
        raise KeyError(kind)

    for kind in ("leaf+dir4", "tri+dir3"):
        def run(packed, o, d, tri):
            order = jnp.argsort(keys_for(kind, o, d, tri))
            return pt.traverse_packed(bvh, packed, o[order], d[order])

        run_j = jax.jit(run)
        t0 = time.perf_counter()
        jax.block_until_ready(run_j(packed, o_s, d_s, parent_tri))
        compile_s = time.perf_counter() - t0
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run_j(packed, o_s, d_s, parent_tri)
        jax.block_until_ready(out[0])
        dt = (time.perf_counter() - t0) / reps
        print(f"  3s {kind}: {n / dt / 1e6:.2f} Mrays/s "
              f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
