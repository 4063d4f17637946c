"""Config-2 stage breakdown: where does the Cornell GGX+MIS launch spend?

Times, at the real bench launch shape (512x512, spp chunk 16, lane quota 8
-> 512k lanes), each component of the persistent-lane bounce body in
isolation, plus the full launch and its while-loop iteration count.
Run directly on the TPU box (one process at a time).

  python scripts/cfg2_probe.py [--lanes 524288] [--quota 8]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, *args, reps=5, label=""):
    import jax

    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"  {label:34s}: {dt*1e3:9.2f} ms   (compile {compile_s:5.1f}s)")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=1 << 19)
    ap.add_argument("--quota", type=int, default=8)
    ap.add_argument("--spl", type=int, default=16, help="samples per launch")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import terra_tpu as tt
    import importlib
    render_mod = importlib.import_module('terra_tpu.render')
    from terra_tpu import bsdf
    from terra_tpu.ops import rng as rng_mod
    from terra_tpu.ops.rng import PathStreams as S
    from terra_tpu.surface import build_shade_tables, surface_init

    scene = tt.scenes.cornell_box(accelerator=tt.Accelerator.BRUTE,
                                  wall_bsdf=tt.BSDFType.GGX)
    cam = tt.scenes.cornell_camera()
    opts = tt.RenderOptions(
        width=512, height=512, samples_per_pixel=16, bounces=4,
        integrator=tt.Integrator.DIRECT_MIS, subpixel_jitter=0.5,
        samples_per_launch=args.spl, samples_per_lane=args.quota,
    )
    ntri = int(scene.geometry.tri_vidx.shape[0])
    n = args.lanes
    print(f"tris={ntri} lanes={n} quota={args.quota}")

    k0, k1 = rng_mod.key_from_seed(0)
    key = jnp.array([k0, k1], jnp.uint32)

    # --- full launch + iteration count
    def launch():
        return render_mod.render_chunk(scene, cam, opts, key, jnp.int32(0), args.spl)

    full_dt = timed(launch, reps=3, label=f"full launch (512^2 spp{args.spl})")
    print(f"  -> {full_dt*1e3/args.spl:.2f} ms/spp")

    quota = min(args.quota, args.spl)
    pixel_idx, px, py, sample_idx = render_mod._lane_ids(opts, args.spl // quota, 0)
    lane_base = (sample_idx - 0) * quota

    @jax.jit
    def persistent_iters():
        lo, iters = render_mod.trace_persistent(
            scene, opts, cam, key, pixel_idx, px, py, lane_base, quota,
            return_iters=True)
        return iters

    it = int(persistent_iters())
    max_it = quota * (opts.bounces + 1)
    print(f"  while-loop iterations: {it} (cap {max_it}) -> "
          f"{full_dt*1e3/max(it,1):.2f} ms/iter")

    # --- components at the launch's lane count
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    d_ = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d_ / np.linalg.norm(d_, axis=-1, keepdims=True))

    raycast = render_mod.make_raycast_fn(scene, opts)
    rc = jax.jit(lambda o, d: raycast(o, d).t)
    timed(rc, o, d, label=f"brute closest-hit ({ntri} tris)")

    tmax = jnp.full((n,), 1.5, jnp.float32)
    rco = jax.jit(lambda o, d: raycast(o, d, t_max=tmax).hit)
    timed(rco, o, d, label="brute ranged occlusion")

    streams = render_mod._streams_for(opts.integrator, opts.env_nee)
    pix = jnp.arange(n, dtype=jnp.int32)

    @jax.jit
    def rng_bundle(pix):
        u = rng_mod.path_uniform_bundle(key, pix, pix, jnp.int32(1), streams)
        return sum(u.values()) if isinstance(u, dict) else u[streams[0]]

    timed(rng_bundle, pix, label=f"threefry bundle ({len(streams)} streams)")

    tables = build_shade_tables(scene)
    tris = jnp.asarray(rng.integers(0, ntri, (n,)), jnp.int32)

    @jax.jit
    def surf_init(o, d, tris):
        s = surface_init(scene, tables, o, d, tris)
        return s.point + s.normal + s.emissive

    timed(surf_init, o, d, tris, label="surface_init")

    surf = jax.jit(lambda o, d, t: surface_init(scene, tables, o, d, t))(o, d, tris)
    present = scene.materials.types_present
    e = jnp.asarray(rng.random((3, n), np.float32))

    @jax.jit
    def bsdf_block(wo):
        wi, aux = bsdf.sample(surf, e[0], e[1], e[2], wo, present)
        pdf = bsdf.pdf(surf, wi, wo, aux, present)
        f = bsdf.eval_f(surf, wi, wo, present)
        return f * pdf[..., None] + wi

    timed(bsdf_block, -d, label="bsdf sample+pdf+eval (GGX mix)")


if __name__ == "__main__":
    main()
