"""Leaf-demand dilation probe (round 5): how much of the dense leaf work
is packet dilation, at which granularity?

For the bench 3m workload (1M-tri courtyard, 1M dir3-sorted primary rays)
this measures, per ray in SORTED order:

  demand(ray)  = leaf nodes whose box entry t <= the ray's true hit t
                 (the leaf set a PERFECT per-ray ordered traversal tests)
  row union    = |union of demand over each 128-lane row|
  way union    = |union of demand over each 1024-lane way packet|
  unterminated = leaf boxes with entry < T_FAR (what a traversal with NO
                 best-t tightening — e.g. a decoupled emit-pairs phase —
                 would visit)

The ratios bound every compaction design before building it:
  tests/ray now ~ way_union * leaf_size  (the measured 930 at 1M tris)
  row-compacted dense phase ~ row_union * leaf_size
  perfect compaction ~ demand * leaf_size
and unterminated/demand prices the loss of in-traversal best-t
tightening for any decoupled traversal/intersection split.

Run ON the TPU box: python scripts/demand_probe.py [--rays 262144]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 18)
    ap.add_argument("--grid", type=int, default=690)
    ap.add_argument("--block", type=int, default=4096)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import terra_tpu as tt
    from terra_tpu import camera as camera_mod
    from terra_tpu.accel import pallas_traverse as pt
    from terra_tpu.accel import traverse as xla_traverse
    from terra_tpu.intersect import T_FAR

    cpu = jax.devices("cpu")[0]
    t0 = time.perf_counter()
    with jax.default_device(cpu):
        scene = tt.scenes.courtyard(grid=args.grid, columns=40)
    scene = jax.device_put(scene, jax.devices()[0])
    jax.block_until_ready(scene.bvh.node_min)
    print(f"scene: {int(scene.geometry.tri_vidx.shape[0])} tris, "
          f"build {time.perf_counter()-t0:.1f}s", flush=True)
    bvh = scene.bvh
    ni = int(bvh.num_internal)
    L = int(bvh.num_leaves)
    print(f"leaves={L} leaf_size={bvh.leaf_size} wide={bvh.num_wide}")

    n = 1 << 20
    side = 1024
    cam = tt.scenes.courtyard_camera()
    px, py = jnp.meshgrid(jnp.arange(side), jnp.arange(side))
    px = px.reshape(-1).astype(jnp.float32)
    py = py.reshape(-1).astype(jnp.float32)
    zeros = jnp.zeros_like(px)
    o, d = camera_mod.generate_rays(cam, side, side, px, py, 0.0, zeros, zeros)

    # the bench's exact sort order
    keys = xla_traverse._sort_keys(o, d, bvh.node_min[0], bvh.node_max[0],
                                   mode="dir3")
    order = jnp.argsort(keys)
    o = o[order][: args.rays]
    d = d[order][: args.rays]

    # true hit t from the production kernel (sorted already; sort_rays off)
    packed = pt.pack_tables_auto(bvh, *scene.geometry.corners())
    t0 = time.perf_counter()
    hit = jax.jit(lambda p, o, d: pt.raycast(
        scene, o, d, packed=p, sort_rays=False))(packed, o, d)
    jax.block_until_ready(hit.t)
    print(f"kernel hit t: {time.perf_counter()-t0:.1f}s "
          f"(hit rate {float(jnp.mean(hit.hit)):.3f})", flush=True)
    tt_hit = jnp.where(hit.hit, hit.t, T_FAR)

    # leaf boxes: binary node ids [ni, ni+L)
    lmin = bvh.node_min[ni:ni + L]  # (L, 3)
    lmax = bvh.node_max[ni:ni + L]

    B = args.block
    nb = args.rays // B

    def block_stats(ob, db, tb):
        inv = jnp.where(jnp.abs(db) > 1e-12, 1.0 / db, 1e12)
        t1 = (lmin[None] - ob[:, None]) * inv[:, None]   # (B, L, 3)
        t2 = (lmax[None] - ob[:, None]) * inv[:, None]
        tmin = jnp.max(jnp.minimum(t1, t2), axis=2)      # (B, L)
        tmax = jnp.min(jnp.maximum(t1, t2), axis=2)
        enter = tmax >= jnp.maximum(tmin, 0.0)
        dem = enter & (tmin <= tb[:, None])              # terminated demand
        unt = enter & (tmin < T_FAR)                     # no tightening
        demand = jnp.sum(dem, axis=1)                    # (B,)
        unterm = jnp.sum(unt, axis=1)
        rowm = dem.reshape(B // 128, 128, -1).any(axis=1)
        row_union = jnp.sum(rowm, axis=1)                # (B/128,)
        waym = dem.reshape(B // 1024, 1024, -1).any(axis=1)
        way_union = jnp.sum(waym, axis=1)                # (B/1024,)
        urowm = unt.reshape(B // 128, 128, -1).any(axis=1)
        urow_union = jnp.sum(urowm, axis=1)
        uwaym = unt.reshape(B // 1024, 1024, -1).any(axis=1)
        uway_union = jnp.sum(uwaym, axis=1)
        return demand, unterm, row_union, way_union, urow_union, uway_union

    bs = jax.jit(block_stats)
    acc = [[] for _ in range(6)]
    t0 = time.perf_counter()
    for i in range(nb):
        sl = slice(i * B, (i + 1) * B)
        out = bs(o[sl], d[sl], tt_hit[sl])
        for a, v in zip(acc, out):
            a.append(np.asarray(v))
        if i == 0:
            print(f"first block {time.perf_counter()-t0:.1f}s", flush=True)
    demand, unterm, row_u, way_u, urow_u, uway_u = [
        np.concatenate(a) for a in acc]
    print(f"demand sweep: {time.perf_counter()-t0:.1f}s over {nb} blocks")

    ls = int(bvh.leaf_size)

    def stats(name, x, per, mult):
        # mult converts a union count into dense tri tests per RAY:
        # each union leaf pays a dense test over the whole group, so
        # tests/ray = union * leaf_size (group-size independent).
        print(f"{name:22s} mean {x.mean():8.2f}  p50 {np.percentile(x,50):7.1f}"
              f"  p90 {np.percentile(x,90):7.1f}  p99 {np.percentile(x,99):8.1f}"
              f"  max {x.max():8.0f}   -> tests/ray {x.mean()*mult:7.1f}")

    print(f"\nper-ray leaf demand (leaf_size={ls}):")
    stats("demand/ray", demand, 1, ls)
    stats("unterminated/ray", unterm, 1, ls)
    print("unions (terminated):")
    stats("row(128) union", row_u, 128, ls)
    stats("way(1024) union", way_u, 1024, ls)
    print("unions (unterminated):")
    stats("row(128) union", urow_u, 128, ls)
    stats("way(1024) union", uway_u, 1024, ls)
    print(f"\ndilation now (way/perfect): {way_u.mean()/max(demand.mean(),1e-9):.1f}x"
          f"   row-compaction bound: {row_u.mean()/max(demand.mean(),1e-9):.1f}x"
          f"   termination-loss: {unterm.mean()/max(demand.mean(),1e-9):.1f}x")


if __name__ == "__main__":
    main()
