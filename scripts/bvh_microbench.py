"""BVH traversal microbenchmark: Mrays/s + node visits per packet.

Measures the Pallas ordered-stack kernel (accel/pallas_traverse.py) on a
courtyard-class mesh for primary and incoherent rays, across packet sizes.
Run directly on the TPU box (one process at a time).

  python scripts/bvh_microbench.py [--grid 150] [--columns 20] [--rays 1048576]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=150)
    ap.add_argument("--columns", type=int, default=20)
    ap.add_argument("--rays", type=int, default=1 << 20)
    ap.add_argument("--packet-rows", type=int, nargs="+", default=[8])
    ap.add_argument("--leaf-size", type=int, default=0,
                    help="rebuild the BVH with this leaf size (0 = scene default)")
    ap.add_argument("--queue", type=int, default=0,
                    help="leaf-DMA queue depth (0 = kernel default)")
    ap.add_argument("--builder", default="", choices=["", "sah", "lbvh"],
                    help="rebuild the BVH with this builder")
    ap.add_argument("--algo", default="mt", choices=["mt", "watertight"])
    ap.add_argument("--sort-mode", default="octant",
                    choices=["octant", "dir2", "dir3", "treelet"])
    ap.add_argument("--row-groups", type=int, default=0,
                    help="leaf-test row bands (0 = kernel default)")
    ap.add_argument("--push-mode", default="entry", choices=["entry", "axis"])
    ap.add_argument("--ways", type=int, default=1,
                    help="interleaved packets per grid step (pass --packet-rows 8*ways)")
    ap.add_argument("--arity", type=int, default=2, choices=[2, 4],
                    help="2 = binary kernel, 4 = BVH4 wide kernel")
    ap.add_argument("--box-enc", default="f32", choices=["f32", "bf16"],
                    help="wide-node box encoding (bf16 = quantized, half SMEM)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import terra_tpu as tt
    from terra_tpu import camera as camera_mod
    from terra_tpu.accel import pallas_traverse as pt
    from terra_tpu.accel import traverse as xla_traverse

    scene = tt.scenes.courtyard(grid=args.grid, columns=args.columns)
    if args.leaf_size or args.builder:
        import dataclasses
        from terra_tpu.accel import lbvh
        scene = dataclasses.replace(
            scene, bvh=lbvh.build(scene.geometry,
                                  leaf_size=args.leaf_size or None,
                                  builder=args.builder or "sah"))
    bvh = scene.bvh
    ntri = scene.geometry.tri_vidx.shape[0]
    queue = args.queue or pt.QUEUE
    print(f"tris={ntri} leaves={bvh.num_leaves} leaf_size={bvh.leaf_size} "
          f"queue={queue} algo={args.algo}")

    n = args.rays
    cam = tt.scenes.courtyard_camera()
    side = int(np.sqrt(n))
    px, py = jnp.meshgrid(jnp.arange(side), jnp.arange(side))
    px = px.reshape(-1).astype(jnp.float32)
    py = py.reshape(-1).astype(jnp.float32)
    zeros = jnp.zeros_like(px)
    o_p, d_p = camera_mod.generate_rays(cam, side, side, px, py, 0.0, zeros, zeros)

    rng = np.random.default_rng(0)
    lo = np.asarray(bvh.node_min[0]); hi = np.asarray(bvh.node_max[0])
    o_i = jnp.asarray(rng.uniform(lo + 0.1, hi - 0.1, (side * side, 3)).astype(np.float32))
    d_ = rng.normal(size=(side * side, 3)).astype(np.float32)
    d_i = jnp.asarray(d_ / np.linalg.norm(d_, axis=-1, keepdims=True))

    tri_a, tri_b, tri_c = scene.geometry.corners()
    if args.arity == 4:
        packed = pt.pack_tables_wide(bvh, tri_a, tri_b, tri_c, box_enc=args.box_enc)
    else:
        packed = pt.pack_tables(bvh, tri_a, tri_b, tri_c)

    # packed tables ride as jit arguments — closed-over device arrays
    # inline as program constants and blow the remote-compile body limit
    # at 1M tris (HTTP 413)
    def run(packed, o, d, rows, count_steps):
        m = o.shape[0]
        keys = xla_traverse._sort_keys(o, d, bvh.node_min[0], bvh.node_max[0],
                                       mode=args.sort_mode, bvh=bvh)
        order = jnp.argsort(keys)
        o = o[order]; d = d[order]
        pad = -m % (rows * 128)
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)], axis=0)
            d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)], axis=0)
        return pt._traverse_pallas(bvh, *packed, o, d, packet_rows=rows,
                                   count_steps=count_steps, interpret=args.cpu,
                                   algo=args.algo, queue=queue,
                                   row_groups=args.row_groups or pt.ROW_GROUPS,
                                   push_mode=args.push_mode, ways=args.ways,
                                   arity=args.arity, box_enc=args.box_enc)

    run_base = jax.jit(run, static_argnums=(3, 4))
    run_j = lambda o, d, rows, cs: run_base(packed, o, d, rows, cs)

    for rows in args.packet_rows:
        for name, (o, d) in (("primary", (o_p, d_p)), ("incoherent", (o_i, d_i))):
            t0 = time.perf_counter()
            out = run_j(o, d, rows, True)
            jax.block_until_ready(out)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                out = run_j(o, d, rows, True)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / reps
            steps = np.asarray(out[2]).reshape(-1, rows * 128)[:, 0]
            mrays = o.shape[0] / dt / 1e6
            print(f"rows={rows:2d} {name:10s}: {mrays:8.2f} Mrays/s  "
                  f"({dt*1e3:7.1f} ms, compile {compile_s:.0f}s)  "
                  f"visits/packet avg={steps.mean():8.1f} p95={np.percentile(steps, 95):8.1f} "
                  f"visits/ray={steps.sum()/o.shape[0]:6.2f}")


if __name__ == "__main__":
    main()
