"""Config-3b stage probe: what does the courtyard production render pay?

Builds REALISTIC ray distributions on the 242k courtyard — camera rays,
first-hit cosine bounce rays, NEE shadow rays toward the actual lights —
and times the Pallas raycast on each, plus the ranged/any-hit occlusion
variants. Run directly on the TPU box (one process at a time).

  python scripts/cfg3b_probe.py [--lanes 1179648]
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
    ap.add_argument("--lanes", type=int, default=384 * 384 * 8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import terra_tpu as tt
    from terra_tpu import camera as camera_mod, intersect, lights
    from terra_tpu.accel import pallas_traverse as pt
    from terra_tpu.ops import math3, rng as rng_mod

    scene = tt.scenes.courtyard()
    cam = tt.scenes.courtyard_camera()
    n = args.lanes
    print(f"tris={int(scene.geometry.tri_vidx.shape[0])} "
          f"leaf={scene.bvh.leaf_size} mode={pt.wide_mode(scene.bvh)} lanes={n}")

    side = int(np.sqrt(n))
    n = side * side
    px, py = jnp.meshgrid(jnp.arange(side), jnp.arange(side))
    px = px.reshape(-1).astype(jnp.float32)
    py = py.reshape(-1).astype(jnp.float32)
    zeros = jnp.zeros_like(px)
    o_p, d_p = camera_mod.generate_rays(cam, side, side, px, py, 0.0, zeros, zeros)

    packed = pt.pack_tables_auto(scene.bvh, *scene.geometry.corners())

    def ray(o, d, t_max=None, any_hit=False):
        return pt.raycast(scene, o, d, packed=packed, t_max=t_max,
                          any_hit=any_hit).t

    ray_j = jax.jit(ray, static_argnames=("any_hit",))

    # first hits -> realistic bounce origins/directions (cosine about n_g)
    hit = pt.raycast(scene, o_p, d_p, packed=packed)
    from terra_tpu.surface import build_shade_tables, surface_init
    tables = build_shade_tables(scene)
    surf = jax.jit(lambda: surface_init(
        scene, tables, o_p + d_p * intersect.RAY_OFFSET_DIR, d_p, hit.tri))()
    rng = np.random.default_rng(0)
    e1 = jnp.asarray(rng.random(n, np.float32))
    e2 = jnp.asarray(rng.random(n, np.float32))
    ct = jnp.sqrt(e1)
    st = jnp.sqrt(jnp.maximum(1.0 - e1, 0.0))
    phi = 2.0 * np.pi * e2
    local = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=1)
    nrm = surf.normal
    t_ = math3.normalize(jnp.cross(nrm, jnp.asarray([0.12, 0.98, 0.17])))
    b_ = jnp.cross(nrm, t_)
    d_b = math3.normalize(local[:, 0:1] * t_ + local[:, 1:2] * b_ + local[:, 2:3] * nrm)
    o_b = surf.point + nrm * np.float32(1e-4)

    # NEE shadow rays toward actual sampled light points
    k0, k1 = rng_mod.key_from_seed(3)
    key = jnp.array([k0, k1], jnp.uint32)
    e_pick = jnp.asarray(rng.random(n, np.float32))
    ls = jax.jit(lambda: lights.pick_and_sample(scene, e_pick, e1, e2))()
    to_l = ls.pos - surf.point
    d_s = math3.normalize(to_l)
    o_s = surf.point + nrm * np.float32(1e-4)
    t_l = math3.length(to_l) * np.float32(1.0 - 1e-3)

    def timed(label, fn):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3
        print(f"  {label:36s}: {n/dt/1e6:7.2f} Mrays/s ({dt*1e3:7.1f} ms, "
              f"compile {comp:4.0f}s)")

    timed("camera rays (octant)", lambda: ray_j(o_p, d_p))
    timed("bounce rays (cosine, real origins)", lambda: ray_j(o_b, d_b))
    timed("shadow ranged closest", lambda: ray_j(o_s, d_s, t_l))
    timed("shadow ranged ANY-HIT", lambda: ray_j(o_s, d_s, t_l, any_hit=True))


if __name__ == "__main__":
    main()
