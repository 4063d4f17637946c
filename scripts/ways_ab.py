"""A/B interleave width on the 1M-tri scene (round 5): at 1M tris the fit
puts pops at 38-44% of time with utilization 0.79-0.80 — more interleaved
packets might hide more reduction latency than the measured 76k-tri sweep
(1/2/4/8-way = 28.4/31.6/35.1/35.4 dir3-primary) suggested. Each variant
is one Mosaic compile. Run directly on the TPU box.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import terra_tpu as tt  # noqa: E402
from terra_tpu import camera as camera_mod  # noqa: E402
from terra_tpu.accel import pallas_traverse as pt  # noqa: E402
from terra_tpu.accel import traverse as xla_traverse  # noqa: E402
from terra_tpu.intersect import T_FAR  # noqa: E402


def main():
    shapes = [(8, 4), (8, 6), (8, 8)]
    if len(sys.argv) > 1:
        shapes = [tuple(int(v) for v in s.split("x"))
                  for s in sys.argv[1].split(",")]

    cpu = jax.devices("cpu")[0]
    t0 = time.perf_counter()
    with jax.default_device(cpu):
        scene = tt.scenes.courtyard(grid=690, columns=40)
    scene = jax.device_put(scene, jax.devices()[0])
    jax.block_until_ready(scene.bvh.node_min)
    bvh = scene.bvh
    mode = pt.wide_mode(bvh)
    print(f"mega built {time.perf_counter() - t0:.0f}s leaf {bvh.leaf_size} "
          f"mode {mode}", flush=True)
    cam = tt.scenes.courtyard_camera()
    n = 1 << 20
    side = int(np.sqrt(n))
    px, py = jnp.meshgrid(jnp.arange(side), jnp.arange(side))
    px = px.reshape(-1).astype(jnp.float32)
    py = py.reshape(-1).astype(jnp.float32)
    zeros = jnp.zeros_like(px)
    o, d = camera_mod.generate_rays(cam, side, side, px, py, 0.0, zeros, zeros)
    packed = pt.pack_tables_auto(bvh, *scene.geometry.corners())

    for rows_pp, ways in shapes:
        if (n // 128) % (rows_pp * ways):
            print(f"  ({rows_pp},{ways}): skipped (grid rows "
                  f"{n // 128} not divisible)", flush=True)
            continue
        def run(packed, o, d, rows_pp=rows_pp, ways=ways):
            keys = xla_traverse._sort_keys(o, d, bvh.node_min[0],
                                           bvh.node_max[0], mode="dir3")
            order = jnp.argsort(keys)
            bt, bi = pt.traverse_packed(bvh, packed, o[order], d[order],
                                        mode=mode,
                                        packet_rows=rows_pp * ways, ways=ways)
            return bt, bi, order

        run_j = jax.jit(run)
        t0 = time.perf_counter()
        out = run_j(packed, o, d)
        jax.block_until_ready(out[0])
        compile_s = time.perf_counter() - t0
        idx = np.asarray(out[2][:2048])
        ref = xla_traverse.raycast(scene, o[idx], d[idx])
        hk = np.asarray(out[0][:2048]) < T_FAR
        assert (hk == np.asarray(ref.hit)).all(), f"{rows_pp}x{ways} GATE FAIL"
        t0 = time.perf_counter()
        for _ in range(3):
            out = run_j(packed, o, d)
        jax.block_until_ready(out[0])
        dt = (time.perf_counter() - t0) / 3
        print(f"  ({rows_pp},{ways}): {n / dt / 1e6:.2f} Mrays/s "
              f"({dt * 1e3:.1f} ms) [compile {compile_s:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
