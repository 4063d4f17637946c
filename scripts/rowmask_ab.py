"""A/B the row-masked dense-test kernel variants on the real TPU.

Variants per scene (each its own Mosaic compile):
  off  : round-4 kernel (stack-queued leaves, full (CH,R,128) dense test)
  fill : direct leaf queueing + rowbits in the fill loop, UNMASKED drain
         (isolates the fill-loop cost change: fewer iterations vs the
         per-child rowmin reduction restructure)
  on   : full row-masked drain (8 pl.when row branches per leaf visit)

Run directly on the TPU box (one process at a time, CLAUDE.md).
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


def host_scene(**kw):
    """Build the scene with CPU-device dispatch, then one bulk transfer:
    the op-by-op TPU dispatch of scene construction through the compile
    relay measured 300-860s for the 1M-tri build vs 1.6s on the host
    (round-5; the arrays are identical)."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        scene = tt.scenes.courtyard(**kw)
    scene = jax.device_put(scene, jax.devices()[0])
    jax.block_until_ready(scene.bvh.node_min)
    return scene


def rays_primary(cam, n=1 << 20):
    side = int(np.sqrt(n))
    px, py = jnp.meshgrid(jnp.arange(side), jnp.arange(side))
    px = px.reshape(-1).astype(jnp.float32)
    py = py.reshape(-1).astype(jnp.float32)
    zeros = jnp.zeros_like(px)
    return camera_mod.generate_rays(cam, side, side, px, py, 0.0, zeros, zeros)


def run_one(scene, packed, o, d, row_mask, label, sort_mode="dir3", reps=3):
    bvh = scene.bvh
    mode = pt.wide_mode(bvh)

    def run(packed, o, d):
        keys = xla_traverse._sort_keys(o, d, bvh.node_min[0], bvh.node_max[0],
                                       mode=sort_mode)
        order = jnp.argsort(keys)
        bt, bi = pt.traverse_packed(bvh, packed, o[order], d[order],
                                    mode=mode, row_mask=row_mask)
        return bt, bi, order

    run_j = jax.jit(run)
    t0 = time.perf_counter()
    bt, bi, order = run_j(packed, o, d)
    jax.block_until_ready(bt)
    compile_s = time.perf_counter() - t0
    idx = np.asarray(order[:2048])
    ref = xla_traverse.raycast(scene, o[idx], d[idx])
    hk = np.asarray(bt[:2048]) < T_FAR
    assert (hk == np.asarray(ref.hit)).all(), f"{label}: GATE FAIL"
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run_j(packed, o, d)
    jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t0) / reps
    n = o.shape[0]
    print(f"  {label}: {n / dt / 1e6:.2f} Mrays/s ({dt * 1e3:.1f} ms) "
          f"[compile {compile_s:.0f}s]", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    variants = sys.argv[2].split(",") if len(sys.argv) > 2 else [
        "off", "fill", "on"]
    vmap = {"off": False, "fill": "fill", "on": True}

    if which in ("mega", "both"):
        t0 = time.perf_counter()
        scene = host_scene(grid=690, columns=40)
        print(f"mega built {time.perf_counter() - t0:.0f}s; leaf "
              f"{scene.bvh.leaf_size} mode {pt.wide_mode(scene.bvh)}", flush=True)
        cam = tt.scenes.courtyard_camera()
        o, d = rays_primary(cam)
        packed = pt.pack_tables_auto(scene.bvh, *scene.geometry.corners())
        for v in variants:
            run_one(scene, packed, o, d, vmap[v], f"mega {v}")

    if which in ("courtyard", "both"):
        scene = host_scene()
        cam = tt.scenes.courtyard_camera()
        o, d = rays_primary(cam)
        packed = pt.pack_tables_auto(scene.bvh, *scene.geometry.corners())
        for v in variants:
            run_one(scene, packed, o, d, vmap[v], f"courtyard {v}")


if __name__ == "__main__":
    main()
