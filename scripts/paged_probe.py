"""Measure the treelet-paged Pallas kernel on the real TPU.

Configs (ONE Mosaic compile each — compiles cost minutes through the
remote-compile relay, so the correctness gate reuses the timed kernel's
own output instead of compiling a second shape):
  --courtyard : 242k tris, force-paged at given resident caps
  --mega      : 1M tris at explicit leaf sizes (paged; --bf16 adds the
                bf16 full-table comparison where it fits)

Gate: the first 2048 sorted rays of the timed run vs the XLA packet walk
of the same binary tree (independent traversal).
"""
import argparse
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import terra_tpu as tt  # noqa: E402
from terra_tpu import camera as camera_mod  # noqa: E402
from terra_tpu.accel import lbvh, pallas_traverse as pt  # noqa: E402
from terra_tpu.accel import traverse as xla_traverse  # noqa: E402
from terra_tpu.intersect import T_FAR  # noqa: E402


def rays_for(scene, n=1 << 20, kind="primary", cam=None):
    side = int(np.sqrt(n))
    if kind == "primary":
        px, py = jnp.meshgrid(jnp.arange(side), jnp.arange(side))
        px = px.reshape(-1).astype(jnp.float32)
        py = py.reshape(-1).astype(jnp.float32)
        zeros = jnp.zeros_like(px)
        return camera_mod.generate_rays(cam, side, side, px, py, 0.0, zeros, zeros)
    rng = np.random.default_rng(11)
    lo = np.asarray(scene.bvh.node_min[0])
    hi = np.asarray(scene.bvh.node_max[0])
    o = jnp.asarray(lo + rng.random((n, 3), np.float32) * (hi - lo))
    v = rng.normal(size=(n, 3)).astype(np.float32)
    return o, jnp.asarray(v / np.linalg.norm(v, axis=1, keepdims=True))


def gate_and_time(scene, packed, o, d, sort_mode, label, reps=3, n_check=2048,
                  **tkw):
    bvh = scene.bvh

    def run(packed, o, d):
        keys = xla_traverse._sort_keys(o, d, bvh.node_min[0], bvh.node_max[0],
                                       mode=sort_mode)
        order = jnp.argsort(keys)
        bt, bi = pt.traverse_packed(bvh, packed, o[order], d[order], **tkw)
        return bt, bi, order

    run_j = jax.jit(run)
    t0 = time.perf_counter()
    bt, bi, order = run_j(packed, o, d)
    jax.block_until_ready(bt)
    compile_s = time.perf_counter() - t0

    # gate: first n_check sorted rays vs the XLA walk (independent code)
    idx = np.asarray(order[:n_check])
    ref = xla_traverse.raycast(scene, o[idx], d[idx])
    hk = np.asarray(bt[:n_check]) < T_FAR
    hx = np.asarray(ref.hit)
    assert (hk == hx).all(), f"{label}: GATE FAIL {int((hk != hx).sum())}/{n_check}"
    both = hk & hx
    assert np.allclose(np.asarray(bt[:n_check])[both], np.asarray(ref.t)[both],
                       rtol=1e-4, atol=1e-4), f"{label}: GATE t mismatch"

    t0 = time.perf_counter()
    for _ in range(reps):
        out = run_j(packed, o, d)
    jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t0) / reps
    n = o.shape[0]
    print(f"  {label}: {n / dt / 1e6:.2f} Mrays/s ({sort_mode}; gate ok; "
          f"compile {compile_s:.0f}s)", flush=True)
    return n / dt / 1e6


def with_bvh(scene, leaf_size):
    bvh = lbvh.build(scene.geometry, leaf_size=leaf_size)
    return dataclasses.replace(scene, bvh=bvh)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--courtyard", action="store_true")
    ap.add_argument("--mega", action="store_true")
    ap.add_argument("--leaf", type=int, nargs="*", default=[24])
    ap.add_argument("--caps", type=int, nargs="*", default=[0])
    ap.add_argument("--incoherent", action="store_true")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--npq", type=int, nargs="*", default=[4])
    args = ap.parse_args()

    if args.courtyard:
        scene = tt.scenes.courtyard()
        cam = tt.scenes.courtyard_camera()
        corners = scene.geometry.corners()
        print(f"courtyard {int(scene.geometry.tri_vidx.shape[0])} tris "
              f"leaf {scene.bvh.leaf_size} wide {scene.bvh.num_wide}", flush=True)
        o, d = rays_for(scene, kind="primary", cam=cam)
        for cap in args.caps:
            packed = pt.pack_tables_paged(scene.bvh, *corners,
                                          resident_cap=cap or None)
            s = packed[0].shape[0] // (12 if packed[0].dtype == jnp.int32 else 24)
            gate_and_time(scene, packed, o, d, "dir3",
                          f"paged res={s}/{scene.bvh.num_wide} primary")
            if args.incoherent:
                oi, di = rays_for(scene, kind="incoherent")
                gate_and_time(scene, packed, oi, di, "octant",
                              f"paged res={s} incoh")

    if args.mega:
        t0 = time.perf_counter()
        scene0 = tt.scenes.courtyard(grid=690, columns=40)
        print(f"mega scene built in {time.perf_counter() - t0:.1f}s: "
              f"{int(scene0.geometry.tri_vidx.shape[0])} tris; "
              f"auto leaf {scene0.bvh.leaf_size} mode {pt.wide_mode(scene0.bvh)}",
              flush=True)
        cam = tt.scenes.courtyard_camera()
        for leaf in args.leaf:
            t0 = time.perf_counter()
            scene = with_bvh(scene0, leaf) if leaf != scene0.bvh.leaf_size else scene0
            jax.block_until_ready(scene.bvh.node_min)
            print(f"leaf {leaf}: rebuild {time.perf_counter() - t0:.1f}s, "
                  f"wide {scene.bvh.num_wide}, natural mode "
                  f"{pt.wide_mode(scene.bvh)}", flush=True)
            corners = scene.geometry.corners()
            o, d = rays_for(scene, kind="primary", cam=cam)
            packed = pt.pack_tables_paged(scene.bvh, *corners)
            s = packed[0].shape[0] // (12 if packed[0].dtype == jnp.int32 else 24)
            for npq in args.npq:
                gate_and_time(scene, packed, o, d, "dir3",
                              f"leaf{leaf} npq{npq} paged res={s}/{scene.bvh.num_wide} primary",
                              npq=npq)
                if args.incoherent:
                    oi, di = rays_for(scene, kind="incoherent")
                    gate_and_time(scene, packed, oi, di, "octant",
                                  f"leaf{leaf} npq{npq} paged incoh", npq=npq)
            if args.bf16 and pt.wide_mode(scene.bvh) == "bf16":
                packed_b = pt.pack_tables_wide(scene.bvh, *corners, box_enc="bf16")
                gate_and_time(scene, packed_b, o, d, "dir3",
                              f"leaf{leaf} bf16 primary")


if __name__ == "__main__":
    main()
