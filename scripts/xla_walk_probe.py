"""XLA skip-link walk packet-size sweep: Mrays/s across packet sizes.

Probes the dilation-vs-gather tradeoff of the XLA stackless walk
(accel/traverse.py) for primary and incoherent rays — packet size 1 is a
fully per-ray walk (zero packet union dilation, all HBM gathers). Run
directly on the TPU box (one process at a time).

  python scripts/xla_walk_probe.py [--grid 150] [--rays 262144] \
      [--packets 1 8 16 32 64]
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
    ap.add_argument("--rays", type=int, default=1 << 18)
    ap.add_argument("--packets", type=int, nargs="+", default=[1, 4, 16, 64])
    ap.add_argument("--sort-mode", default="octant",
                    choices=["octant", "dir2", "dir3"])
    ap.add_argument("--unroll", type=int, default=0,
                    help="advance steps per leaf phase (0 = module default)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import terra_tpu as tt
    from terra_tpu import camera as camera_mod
    from terra_tpu.accel import traverse as xw

    if args.unroll:
        xw.ADVANCE_UNROLL = args.unroll

    scene = tt.scenes.courtyard(grid=args.grid, columns=args.columns)
    bvh = scene.bvh
    ntri = scene.geometry.tri_vidx.shape[0]
    print(f"tris={ntri} leaves={bvh.num_leaves} leaf_size={bvh.leaf_size} "
          f"unroll={xw.ADVANCE_UNROLL}")

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

    def run(o, d, packet):
        return xw.raycast(scene, o, d, packet_size=packet).t

    run_j = jax.jit(run, static_argnums=(2,))

    for packet in args.packets:
        for name, (o, d) in (("primary", (o_p, d_p)), ("incoherent", (o_i, d_i))):
            t0 = time.perf_counter()
            out = run_j(o, d, packet)
            jax.block_until_ready(out)
            compile_s = time.perf_counter() - t0
            reps = 3
            t0 = time.perf_counter()
            for _ in range(reps):
                out = run_j(o, d, packet)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / reps
            mrays = o.shape[0] / dt / 1e6
            print(f"packet={packet:3d} {name:10s}: {mrays:8.2f} Mrays/s  "
                  f"({dt*1e3:8.1f} ms, compile {compile_s:.0f}s)")


if __name__ == "__main__":
    main()
