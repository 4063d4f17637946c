"""Headline benchmark: forward Mrays/s/chip on the Cornell box.

BASELINE.md config 1: Cornell box, diffuse BSDF, 64 spp, 256x256.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Ray accounting (conservative, matches the reference's notion of a "ray" =
one closest-hit traversal, TerraBVH.c:250): primary + per-bounce extension
rays actually traced by the wavefront are counted via the measured average
path length; integrator shadow rays are counted on active lanes only.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_MRAYS = 100.0  # driver target: >=100 Mrays/s/chip forward


def measure_avg_active(scene, cam, opts, key):
    """Measured per-bounce active-lane fraction (for honest ray counting)."""
    import jax
    import jax.numpy as jnp

    from terra_tpu import intersect
    from terra_tpu.ops import math3, rng as rng_mod
    from terra_tpu.ops.rng import PathStreams as S
    from terra_tpu import bsdf as bsdf_mod
    from terra_tpu.render import _lane_ids, _pixel_jitter, make_raycast_fn
    from terra_tpu.surface import build_shade_tables, surface_init
    from terra_tpu import camera as camera_mod

    # Small probe render that tracks active counts per bounce (one jit).
    probe_opts = opts.replace(width=64, height=64, samples_per_pixel=8)

    @jax.jit
    def probe():
        pixel_idx, px, py, sample_idx = _lane_ids(probe_opts, 8, jnp.int32(0))
        r1, r2 = _pixel_jitter(probe_opts, key, pixel_idx, sample_idx)
        o, d = camera_mod.generate_rays(cam, 64, 64, px, py, probe_opts.subpixel_jitter, r1, r2)
        raycast = make_raycast_fn(scene, probe_opts)
        tables = build_shade_tables(scene)
        active = jnp.ones(o.shape[0], bool)
        fractions = []
        for bounce in range(opts.bounces + 1):
            hit = raycast(o, d)
            o_off = o + d * intersect.RAY_OFFSET_DIR
            surf = surface_init(scene, tables, o_off, d, hit.tri)
            wo = -d
            active = active & hit.hit
            fractions.append(jnp.mean(active.astype(jnp.float32)))
            e0 = rng_mod.path_uniform(key, pixel_idx, sample_idx, bounce, S.BSDF_E0)
            e1 = rng_mod.path_uniform(key, pixel_idx, sample_idx, bounce, S.BSDF_E1)
            e2 = rng_mod.path_uniform(key, pixel_idx, sample_idx, bounce, S.BSDF_E2)
            wi, aux = bsdf_mod.sample(surf, e0, e1, e2, wo)
            pdf = jnp.maximum(bsdf_mod.pdf(surf, wi, wo, aux), 1e-4)
            f = bsdf_mod.eval_f(surf, wi, wo)
            tp_gain = math3.max3(f * (math3.dot(surf.normal, wi) / pdf)[..., None])
            e3 = rng_mod.path_uniform(key, pixel_idx, sample_idx, bounce, S.ROULETTE)
            # approximation of the roulette survival on unit throughput
            active = active & (e3 <= jnp.minimum(tp_gain, 1.0))
            o = surf.point + surf.normal * intersect.SURFACE_OFFSET_NORMAL
            d = wi
        return jnp.stack(fractions)

    return [float(x) for x in np.asarray(probe())]


def main():
    import jax
    import jax.numpy as jnp

    import terra_tpu as tt
    from terra_tpu.ops import rng as rng_mod
    from terra_tpu.render import render_chunk

    scene = tt.scenes.cornell_box(accelerator=tt.Accelerator.BRUTE)
    cam = tt.scenes.cornell_camera()
    opts = tt.RenderOptions(
        width=256, height=256, samples_per_pixel=64, bounces=4,
        integrator=tt.Integrator.SIMPLE, subpixel_jitter=0.5,
        samples_per_launch=32, samples_per_lane=8,
    )
    k0, k1 = rng_mod.key_from_seed(0)
    key = jnp.array([k0, k1], jnp.uint32)
    spp_chunk = opts.samples_per_launch

    # Honest ray count: primary raycast always runs for every lane each
    # bounce iteration (masked-lane execution), but we count only lanes
    # that were live entering the bounce — what a work-compacting tracer
    # would trace. Shadow rays: none for SIMPLE.
    import sys
    print("probe...", file=sys.stderr, flush=True)
    fractions = measure_avg_active(scene, cam, opts, key)
    print(f"fractions {fractions}", file=sys.stderr, flush=True)
    lanes = opts.width * opts.height * opts.samples_per_pixel
    rays_per_lane = 1.0 + sum(fractions[:-1])  # primary + continuations
    total_rays = lanes * rays_per_lane

    # compile
    print("compiling render chunk...", file=sys.stderr, flush=True)
    acc = render_chunk(scene, cam, opts, key, jnp.int32(0), spp_chunk)
    acc.block_until_ready()
    print("timing...", file=sys.stderr, flush=True)

    # timed: full 64 spp in chunks
    n_chunks = opts.samples_per_pixel // spp_chunk
    t0 = time.perf_counter()
    accs = []
    for i in range(n_chunks):
        accs.append(render_chunk(scene, cam, opts, key, jnp.int32(i * spp_chunk), spp_chunk))
    for a in accs:
        a.block_until_ready()
    dt = time.perf_counter() - t0

    mrays = total_rays / dt / 1e6
    print(json.dumps({
        "metric": "cornell_fwd_mrays_per_chip",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
    }))


if __name__ == "__main__":
    main()
