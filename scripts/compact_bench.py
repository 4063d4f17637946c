"""Compacted two-phase traversal vs the classic kernel on the 3m
workload (1M-tri courtyard, 1M dir3-sorted primaries). Run ON the TPU.

  python scripts/compact_bench.py [--M 128 256] [--shape 1x8 2x8]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=690)
    ap.add_argument("--rays", type=int, default=1 << 20)
    ap.add_argument("--M", type=int, nargs="*", default=[128, 256])
    ap.add_argument("--shape", nargs="*", default=["1x8"])
    ap.add_argument("--check", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import terra_tpu as tt
    from terra_tpu import camera as camera_mod
    from terra_tpu.accel import pallas_traverse as pt
    from terra_tpu.accel import compact as cc
    from terra_tpu.accel import traverse as xla_traverse

    cpu = jax.devices("cpu")[0]
    t0 = time.perf_counter()
    with jax.default_device(cpu):
        scene = tt.scenes.courtyard(grid=args.grid, columns=40)
    scene = jax.device_put(scene, jax.devices()[0])
    jax.block_until_ready(scene.bvh.node_min)
    bvh = scene.bvh
    print(f"scene {int(scene.geometry.tri_vidx.shape[0])} tris leaf "
          f"{bvh.leaf_size} wide {int(bvh.num_wide)} "
          f"({time.perf_counter()-t0:.1f}s)", flush=True)

    n = args.rays
    side = 1024
    cam = tt.scenes.courtyard_camera()
    px, py = jnp.meshgrid(jnp.arange(side), jnp.arange(side))
    px = px.reshape(-1).astype(jnp.float32)
    py = py.reshape(-1).astype(jnp.float32)
    zeros = jnp.zeros_like(px)
    o, d = camera_mod.generate_rays(cam, side, side, px, py, 0.0, zeros, zeros)
    keys = xla_traverse._sort_keys(o, d, bvh.node_min[0], bvh.node_max[0],
                                   mode="dir3")
    order = jnp.argsort(keys)
    o = o[order][:n]
    d = d[order][:n]

    mode = pt.wide_mode(bvh)
    packed = pt.pack_tables_auto(bvh, *scene.geometry.corners())
    print(f"box_enc={mode}", flush=True)

    # classic baseline (sorted already). Timing forces a dependent
    # SCALAR onto the host per rep: on this relay, block_until_ready on
    # unread outputs measured 0.1 ms for a 70 ms kernel (dedup/deferred
    # execution); only a data round-trip is ground truth (round 5).
    run_j = jax.jit(lambda p, o, d: pt.traverse_packed(
        bvh, p, o, d, mode=mode))
    sum_j = jax.jit(lambda p, o, d: jnp.sum(jnp.minimum(pt.traverse_packed(
        bvh, p, o, d, mode=mode)[0], 1e9)))
    t0 = time.perf_counter()
    ref = run_j(packed, o, d)
    jax.block_until_ready(ref)
    print(f"classic compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    # block PER REP: the relay measured 0.1 ms for a 70 ms kernel under
    # the loop-then-block pattern (round-5; mechanism unknown) — per-rep
    # blocking reproduces stable 68-74 ms
    # ... and PERTURB the origin per rep (jitter 1e-5): repeated
    # IDENTICAL dispatches can be served from somewhere without
    # re-executing even when blocked per rep (measured 0.1 ms for this
    # 70 ms kernel), while distinct args always execute.
    reps = 3
    float(sum_j(packed, o, d))  # warm the summed variant
    dts = []
    for k in range(reps):
        ok = o + np.float32(1e-5 * (k + 1))
        jax.block_until_ready(ok)
        t0 = time.perf_counter()
        float(sum_j(packed, ok, d))
        dts.append(time.perf_counter() - t0)
    dt = min(dts)
    print(f"classic: {n/dt/1e6:.2f} Mrays/s ({dt*1e3:.1f} ms) "
          f"dts={[round(x*1e3,1) for x in dts]}", flush=True)
    rt, ri = np.asarray(ref[0]), np.asarray(ref[1])

    for M in args.M:
        t0 = time.perf_counter()
        fr = cc.build_frontier(bvh, max_leaves=M)
        F = int(fr.roots.shape[0])
        print(f"\nM={M}: F={F} (frontier {time.perf_counter()-t0:.1f}s)",
              flush=True)
        for sh in args.shape:
            rows_pp, ways = map(int, sh.split("x"))
            t0 = time.perf_counter()
            try:
                hit = cc.raycast_compact(bvh, packed, fr, o, d,
                                         rows_pp=rows_pp, ways=ways,
                                         rowsz=rows_pp * 128)
                jax.block_until_ready(hit.t)
            except Exception as e:
                print(f"  shape {sh}: FAILED {type(e).__name__}: {e}",
                      flush=True)
                continue
            print(f"  shape {sh}: warm {time.perf_counter()-t0:.1f}s",
                  flush=True)
            dts = []
            for k in range(reps):
                ok = o + np.float32(1e-5 * (k + 1))
                jax.block_until_ready(ok)
                t0 = time.perf_counter()
                hit = cc.raycast_compact(bvh, packed, fr, ok, d,
                                         rows_pp=rows_pp, ways=ways,
                                         rowsz=rows_pp * 128)
                float(jnp.sum(jnp.minimum(hit.t, 1e9)))  # force
                dts.append(time.perf_counter() - t0)
            dt = min(dts)
            print(f"  shape {sh}: {n/dt/1e6:.2f} Mrays/s ({dt*1e3:.1f} ms) "
                  f"dts={[round(x*1e3,1) for x in dts]}", flush=True)
            if args.check:
                # check on the UNPERTURBED rays (the timed reps jitter o)
                hit = cc.raycast_compact(bvh, packed, fr, o, d,
                                         rows_pp=rows_pp, ways=ways,
                                         rowsz=rows_pp * 128)
                gt, gi = np.asarray(hit.t), np.asarray(hit.tri)
                from terra_tpu.intersect import T_FAR
                h1 = rt < T_FAR
                h2 = np.asarray(hit.hit)
                mm = (h1 != h2).sum()
                both = h1 & h2
                tm = (~np.isclose(rt[both], gt[both], rtol=1e-4,
                                  atol=1e-4)).sum()
                print(f"  check: hit mismatch {mm}, t mismatch {tm}",
                      flush=True)


if __name__ == "__main__":
    main()
