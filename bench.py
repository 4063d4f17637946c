"""Headline benchmarks: every BASELINE.md config, one JSON line each.

Configs (BASELINE.md "Benchmark configs"; the courtyard scene is PINNED at
its default build = 241,764 triangles — each metric divides by a baseline
of the same quantity measured at that size):
  1. cornell_fwd_mrays_per_chip — Cornell box, diffuse, 64 spp, 256².
     vs_baseline = value / 100 (driver target: >=100 Mrays/s/chip).
  2. cornell_ggx_mis_mrays — Cornell + GGX walls + MIS NEE, 512², 256 spp.
     vs_baseline = value / 28.0 (round-1 measured).
  3. courtyard_bvh_mrays — Sponza-class 242k-tri textured mesh: BVH build
     (reported as build_ms) + Pallas traversal throughput on sorted
     coherent primary rays. vs_baseline = value / 25.0 (round-2 measured
     at the pinned scene size; round 1's 5.6 was at a 305k-tri variant).
  3i. courtyard_incoherent_mrays — same scene, uniformly random origins/
     directions (the bounce-ray regime that bounds production renders).
     vs_baseline = value / 1.3 (round-2 measured).
  3b. courtyard_render_mrays — the PRODUCTION path end-to-end (camera,
     traversal, textured GGX shading, NEE shadow rays) at 384² 8 spp.
     vs_baseline = value / 3.36 (round-2 measured, same quantity).
  4. inverse_step_ms — inverse-rendering step time (fwd+bwd+adam, 32² 8 spp
     DIRECT). vs_baseline = 100 / value (target: <=100 ms/step).

Config 3 also runs a compiled-kernel correctness gate BEFORE timing: the
compiled (non-interpret) Pallas traversal is checked against the brute-
force intersector on a ray batch; a mismatch fails the config loudly. The
interpret-mode tests in tests/test_pallas_traverse.py cover the kernel's
logic; this gate covers the Mosaic-compiled artifact itself.

Ray accounting (conservative, matches the reference's notion of a "ray" =
one closest-hit traversal, TerraBVH.c:250): primary + per-bounce extension
rays actually traced by the wavefront are counted via the measured average
path survival; integrator shadow rays are counted on active lanes only.

Run directly on the TPU box, one process at a time (see CLAUDE.md).
"""
from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

BASE_CORNELL = 100.0   # driver target, Mrays/s/chip
BASE_GGX_MIS = 28.0    # round-1 measured, Mrays/s
BASE_COURTYARD = 25.0  # round-2 measured (242k tris, primary sorted), Mrays/s
BASE_COURTYARD_INCOH = 1.3   # round-2 measured (242k tris, random rays), Mrays/s
BASE_COURTYARD_BOUNCE = 5.71  # round-3 first measurement (cosine bounce), Mrays/s
BASE_COURTYARD_RENDER = 3.36  # round-2 measured (384^2 8spp DIRECT), Mrays/s
BASE_INVERSE_MS = 100.0  # target ms/step
COURTYARD_TRIS = 241764  # pinned scene size; a drift means the scene changed


def _steady_seconds(call, k1: int = 1, k2: int = 4):
    """Steady-state seconds per call on the axon relay (round-5
    methodology). The relay (a) serves REPEATED IDENTICAL dispatches
    without re-executing and (b) does not treat block_until_ready on
    unread outputs as a completion barrier — loop-then-block measured
    0.1 ms for a kernel whose true execution is ~38 ms. Ground truth:
    chain K DISTINCT dispatches (``call(i)`` must vary its input with
    ``i`` and return a scalar DeviceArray), read only the last (its
    host round-trip proves every chained execution completed on the
    serial device), and DIFFERENCE two chain lengths to cancel the
    ~30 ms dispatch+read latency: exec = (T(k2) - T(k1)) / (k2 - k1).
    Measured stable to ~1% on the traversal kernel (38.5/38.0 ms).

    Every chained output is KEPT ALIVE until the final read: a dropped
    handle lets the relay garbage-collect the buffer and ELIDE that
    execution entirely (config-1 measured 11.6e9 Mrays/s before this —
    T(k2)-T(k1) collapsed to dispatch overhead)."""

    def T(K, base):
        t0 = time.perf_counter()
        outs = [call(base + j) for j in range(K)]
        float(outs[-1])
        return time.perf_counter() - t0

    T(1, 0)   # throwaway: the FIRST distinct-input call after a warm
    # measured a one-time ~0.9 s anomaly (relay-side; config-1 probe)
    t_a = T(k1, 1)
    t_b = T(k2, k1 + 1)
    if t_b <= t_a:  # anomaly leaked into t_a: retime it
        t_a = T(k1, k1 + k2 + 1)
    return max((t_b - t_a) / (k2 - k1), 1e-9)


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _emit(metric, value, unit, vs_baseline, **extra):
    line = {"metric": metric, "value": round(float(value), 3), "unit": unit,
            "vs_baseline": round(float(vs_baseline), 3)}
    line.update(extra)
    print(json.dumps(line), flush=True)


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


def _timed_render(scene, cam, opts, key, shadow_rays_per_bounce: int):
    """Compile, time a full progressive render, return (Mrays/s, seconds).

    All full sample chunks run in ONE device launch (render_chunks: a scan
    over sample offsets) — per-launch dispatch overhead is paid once per
    measured render, like the reference's whole-grid re-push per iteration
    (Renderer.cpp:134-151)."""
    import jax.numpy as jnp

    from terra_tpu.render import render_chunk, render_chunks

    fractions = measure_avg_active(scene, cam, opts, key)
    lanes = opts.width * opts.height * opts.samples_per_pixel
    # path extension rays: primary + continuations that were live entering
    # each bounce; shadow/strategy rays: on lanes live at the shade point.
    path_rays = 1.0 + sum(fractions[:-1])
    shadow_rays = shadow_rays_per_bounce * (1.0 + sum(fractions[:-1]))
    total_rays = lanes * (path_rays + shadow_rays)

    spp_chunk = min(opts.samples_per_launch or opts.samples_per_pixel,
                    opts.samples_per_pixel)
    n_chunks = opts.samples_per_pixel // spp_chunk

    if n_chunks > 1:
        def run(k):
            return jnp.sum(render_chunks(scene, cam, opts, k, jnp.int32(0),
                                         spp_chunk, n_chunks))
    else:
        def run(k):
            return jnp.sum(render_chunk(scene, cam, opts, k, jnp.int32(0),
                                        spp_chunk))

    import jax as _jax

    float(run(key))  # compile + warm
    dt = _steady_seconds(lambda i: run(_jax.random.fold_in(key, i + 1)),
                         k1=1, k2=3)
    return total_rays / dt / 1e6, dt


def bench_cornell(tt, key):
    scene = tt.scenes.cornell_box(accelerator=tt.Accelerator.BRUTE)
    cam = tt.scenes.cornell_camera()
    opts = tt.RenderOptions(
        width=256, height=256, samples_per_pixel=64, bounces=4,
        integrator=tt.Integrator.SIMPLE, subpixel_jitter=0.5,
        samples_per_launch=64, samples_per_lane=64,
    )
    _log("config 1: cornell diffuse 256^2 ...")
    mrays, dt = _timed_render(scene, cam, opts, key, shadow_rays_per_bounce=0)
    _emit("cornell_fwd_mrays_per_chip", mrays, "Mrays/s", mrays / BASE_CORNELL,
          seconds=round(dt, 3))


def bench_ggx_mis(tt, key):
    scene = tt.scenes.cornell_box(accelerator=tt.Accelerator.BRUTE,
                                  wall_bsdf=tt.BSDFType.GGX)
    cam = tt.scenes.cornell_camera()
    opts = tt.RenderOptions(
        width=512, height=512, samples_per_pixel=256, bounces=4,
        integrator=tt.Integrator.DIRECT_MIS, subpixel_jitter=0.5,
        # One launch, 262k persistent lanes with a 256-sample quota: the
        # straggler tail of the lane while-loop amortizes over the whole
        # render (measured 74.5 -> 46.4 ms/spp from quota 8/launch 16;
        # iterations 757 vs the 640 ideal = 85% useful work).
        samples_per_launch=256, samples_per_lane=256,
    )
    _log("config 2: cornell GGX+MIS 512^2 256 spp ...")
    # DIRECT_MIS issues 2 strategy raycasts per shaded bounce (light + bsdf)
    mrays, dt = _timed_render(scene, cam, opts, key, shadow_rays_per_bounce=2)
    _emit("cornell_ggx_mis_mrays", mrays, "Mrays/s", mrays / BASE_GGX_MIS,
          seconds=round(dt, 3))


def _host_courtyard(**kw):
    """Build the scene with CPU-device dispatch + one bulk transfer:
    op-by-op TPU dispatch of scene construction through the compile relay
    measured 300-860s cold for the 1M-tri build vs ~5s on the host
    (round 5, CLAUDE.md); the arrays are identical."""
    import jax
    import terra_tpu as tt

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        scene = tt.scenes.courtyard(**kw)
    scene = jax.device_put(scene, jax.devices()[0])
    np.asarray(scene.bvh.node_min[:1])  # host read = completion proof
    return scene


def _verify_compiled_kernel(scene, o, d, n_check: int = 2048):
    """Correctness gate on the COMPILED Mosaic kernel: closest-hit of a ray
    subset via the Pallas path must match the brute-force intersector.
    Raises on mismatch (fails the config loudly before any timing).
    Tri ids may legitimately differ on exact-t ties; t must agree."""
    import jax
    import jax.numpy as jnp
    from terra_tpu import intersect
    from terra_tpu.accel import pallas_traverse as pt

    o_s, d_s = o[:n_check], d[:n_check]
    hit_k = jax.jit(lambda o, d: pt.raycast(scene, o, d))(o_s, d_s)
    tri_a, tri_b, tri_c = scene.geometry.corners()
    hit_b = jax.jit(
        lambda o, d: intersect.raycast_brute(o, d, tri_a, tri_b, tri_c)
    )(o_s, d_s)
    hk = np.asarray(hit_k.hit)
    hb = np.asarray(hit_b.hit)
    tk = np.asarray(hit_k.t)
    tb = np.asarray(hit_b.t)
    if not (hk == hb).all():
        bad = int((hk != hb).sum())
        raise AssertionError(f"compiled kernel hit mask mismatch on {bad}/{n_check} rays")
    both = hk & hb
    if both.any() and not np.allclose(tk[both], tb[both], rtol=1e-4, atol=1e-4):
        worst = float(np.abs(tk[both] - tb[both]).max())
        raise AssertionError(f"compiled kernel t mismatch (max |dt| = {worst})")
    _log(f"  compiled-kernel gate ok ({n_check} rays vs brute force)")


def bench_courtyard(tt, key):
    import jax
    import jax.numpy as jnp
    from terra_tpu import camera as camera_mod
    from terra_tpu.accel import lbvh, pallas_traverse as pt
    from terra_tpu.accel import traverse as xla_traverse

    _log("config 3: courtyard 242k-tri build+traversal ...")
    t0 = time.perf_counter()
    scene = _host_courtyard()  # pinned: 241,764 tris, textured, BVH
    total_build_s = time.perf_counter() - t0
    ntri = int(scene.geometry.tri_vidx.shape[0])
    if ntri != COURTYARD_TRIS:
        _log(f"  WARNING: courtyard drifted to {ntri} tris "
             f"(baselines measured at {COURTYARD_TRIS})")
    # isolate the BVH build itself (scene construction includes geometry)
    t0 = time.perf_counter()
    bvh = lbvh.build(scene.geometry, leaf_size=scene.bvh.leaf_size)
    np.asarray(bvh.node_min[:1])  # host read = completion proof
    build_ms = (time.perf_counter() - t0) * 1e3

    n = 1 << 20
    cam = tt.scenes.courtyard_camera()
    side = int(np.sqrt(n))
    px, py = jnp.meshgrid(jnp.arange(side), jnp.arange(side))
    px = px.reshape(-1).astype(jnp.float32)
    py = py.reshape(-1).astype(jnp.float32)
    zeros = jnp.zeros_like(px)
    o, d = camera_mod.generate_rays(cam, side, side, px, py, 0.0, zeros, zeros)
    packed = pt.pack_tables_auto(scene.bvh, *scene.geometry.corners())
    wmode = pt.wide_mode(scene.bvh)
    arity = 4 if wmode else 2

    _verify_compiled_kernel(scene, o, d)

    leaf_of = xla_traverse.leaf_of_tri_table(scene.bvh)

    def run(packed, o, d, mode, hint=None):
        if hint is not None:  # parent-hit keys (the production bounce sort)
            keys = xla_traverse.hinted_keys(leaf_of, hint, d)
        else:
            keys = xla_traverse._sort_keys(o, d, scene.bvh.node_min[0],
                                           scene.bvh.node_max[0], mode=mode)
        # payload sort (round 5): 4x cheaper than argsort + row-gathers;
        # components stay separate all the way to the kernel
        srt = jax.lax.sort((keys, o[:, 0], o[:, 1], o[:, 2],
                            d[:, 0], d[:, 1], d[:, 2]), num_keys=1)
        return pt._traverse_pallas(scene.bvh, *packed, srt[1:4], srt[4:7],
                                   packet_rows=pt.PACKET_ROWS * pt.INTERLEAVE,
                                   ways=pt.INTERLEAVE, arity=arity,
                                   box_enc=wmode or "f32")

    def timed(o, d, mode, hint=None):
        # round-5 steady-state methodology (_steady_seconds): distinct
        # per-rep inputs (1e-6 origin jitter), dependent-scalar reads,
        # latency cancelled by chain differencing
        sum_j = jax.jit(lambda p, o, d, hint: jnp.sum(jnp.minimum(
            run(p, o, d, hint=hint, mode=mode)[0], jnp.float32(1e9))))
        perturbs = [o + np.float32(1e-6 * (k + 1)) for k in range(8)]
        jax.block_until_ready(perturbs)
        float(sum_j(packed, o, d, hint))
        dt = _steady_seconds(lambda i: sum_j(packed, perturbs[i], d, hint))
        return n / dt / 1e6

    # camera batches are known-coherent: direction-major key (dir3)
    mrays = timed(o, d, "dir3")
    _emit("courtyard_bvh_mrays", mrays, "Mrays/s", mrays / BASE_COURTYARD,
          tris=ntri, build_ms=round(build_ms, 1),
          scene_build_s=round(total_build_s, 2))

    # 3i: incoherent rays — uniformly random origins inside the scene bounds
    # and uniform sphere directions (the bounce-ray regime). Octant sort.
    _log("config 3i: courtyard incoherent rays ...")
    rng = np.random.default_rng(11)
    lo = np.asarray(scene.bvh.node_min[0])
    hi = np.asarray(scene.bvh.node_max[0])
    o_i = jnp.asarray(lo + rng.random((n, 3), np.float32) * (hi - lo))
    v = rng.normal(size=(n, 3)).astype(np.float32)
    d_i = jnp.asarray(v / np.linalg.norm(v, axis=1, keepdims=True))
    mrays_i = timed(o_i, d_i, "octant")
    _emit("courtyard_incoherent_mrays", mrays_i, "Mrays/s",
          mrays_i / BASE_COURTYARD_INCOH, tris=ntri)

    # 3s: REALISTIC secondary rays — cosine-hemisphere directions from the
    # camera rays' first-hit surfaces (what the production render's bounce
    # batches actually look like). Uniform-random 3i is the adversarial
    # floor; this is the rate that bounds config 3b (measured 3.6x faster
    # than 3i: real bounce origins cluster on visible surfaces).
    _log("config 3s: courtyard first-bounce (cosine) rays ...")
    from terra_tpu import intersect as intersect_mod
    from terra_tpu.surface import build_shade_tables, surface_init
    from terra_tpu.ops import math3
    hit0 = pt.raycast(scene, o, d, packed=packed)
    tables = build_shade_tables(scene)
    surf = jax.jit(lambda: surface_init(
        scene, tables, o + d * intersect_mod.RAY_OFFSET_DIR, d, hit0.tri))()
    rb = np.random.default_rng(12)
    e1 = jnp.asarray(rb.random(n, np.float32))
    e2 = jnp.asarray(rb.random(n, np.float32))
    st = jnp.sqrt(jnp.maximum(1.0 - e1, 0.0))
    phi = np.float32(2.0 * np.pi) * e2
    nrm = surf.normal
    t_ax = math3.normalize(jnp.cross(nrm, jnp.asarray([0.12, 0.98, 0.17])))
    b_ax = jnp.cross(nrm, t_ax)
    d_s = math3.normalize(
        (st * jnp.cos(phi))[:, None] * t_ax + (st * jnp.sin(phi))[:, None] * b_ax
        + jnp.sqrt(e1)[:, None] * nrm)
    o_s = surf.point + nrm * np.float32(1e-4)
    # production bounce sort: parent-hit (leaf, dir3) keys — the wavefront
    # driver threads the previous hit's tri ids into every raycast
    mrays_s = timed(o_s, d_s, "octant", hint=hit0.tri)
    _emit("courtyard_bounce_mrays", mrays_s, "Mrays/s",
          mrays_s / BASE_COURTYARD_BOUNCE, tris=ntri, sort="parent-hit")

    # 3b: the PRODUCTION path end-to-end — full render loop (camera, BVH
    # traversal, textured surfaces, GGX, NEE shadow rays, persistent lanes)
    _log("config 3b: courtyard full render 384^2 ...")
    opts = tt.RenderOptions(
        width=384, height=384, samples_per_pixel=8, bounces=2,
        integrator=tt.Integrator.DIRECT, subpixel_jitter=0.5,
        # quota = the full spp: one persistent lane per pixel traces all 8
        # samples (measured +17% over quota 4 — smaller straggler tail)
        samples_per_lane=8,
    )
    mrays_r, dt_r = _timed_render(scene, cam, opts, key, shadow_rays_per_bounce=1)
    _emit("courtyard_render_mrays", mrays_r, "Mrays/s",
          mrays_r / BASE_COURTYARD_RENDER, seconds=round(dt_r, 3))


def bench_mega(tt, key):
    """Config 3m: ~1M-tri procedural scene stays on the Pallas kernel via
    the bf16-quantized BVH4 overlay (VERDICT r2 item 7: no silent
    leaf-growth fallback to the XLA walk). vs_baseline divides by the 242k
    courtyard-primary baseline (no prior same-size measurement exists) —
    the column reads as "fraction of the small-scene rate kept at 4x the
    triangles"."""
    import jax
    import jax.numpy as jnp
    from terra_tpu import camera as camera_mod
    from terra_tpu.accel import pallas_traverse as pt
    from terra_tpu.accel import traverse as xla_traverse

    _log("config 3m: 1M-tri scene (quantized wide kernel) ...")
    t0 = time.perf_counter()
    scene = _host_courtyard(grid=690, columns=40)  # 1,013,964 tris
    build_s = time.perf_counter() - t0
    bvh = scene.bvh
    mode = pt.wide_mode(bvh)
    _log(f"  tris={int(scene.geometry.tri_vidx.shape[0])} leaf={bvh.leaf_size} "
         f"wide={bvh.num_wide} box_enc={mode} build={build_s:.1f}s")

    n = 1 << 20
    cam = tt.scenes.courtyard_camera()
    side = int(np.sqrt(n))
    px, py = jnp.meshgrid(jnp.arange(side), jnp.arange(side))
    px = px.reshape(-1).astype(jnp.float32)
    py = py.reshape(-1).astype(jnp.float32)
    zeros = jnp.zeros_like(px)
    o, d = camera_mod.generate_rays(cam, side, side, px, py, 0.0, zeros, zeros)
    packed = pt.pack_tables_auto(bvh, *scene.geometry.corners())
    arity = 4 if mode else 2

    # correctness gate: compiled quantized kernel vs the XLA packet walk
    # (independent traversal of the same binary tree)
    h_k = jax.jit(lambda o, d: pt.raycast(scene, o, d))(o[:2048], d[:2048])
    h_x = xla_traverse.raycast(scene, o[:2048], d[:2048])
    hk, hx = np.asarray(h_k.hit), np.asarray(h_x.hit)
    if not (hk == hx).all():
        raise AssertionError(f"1M-tri wide kernel hit mismatch on {(hk != hx).sum()}")
    both = hk & hx
    if not np.allclose(np.asarray(h_k.t)[both], np.asarray(h_x.t)[both],
                       rtol=1e-4, atol=1e-4):
        raise AssertionError("1M-tri wide kernel t mismatch")
    _log("  quantized-kernel gate ok (2048 rays vs XLA walk)")

    # packed tables ride as jit ARGUMENTS: closing over them would inline
    # the ~40MB tri table as a program constant and blow the remote-compile
    # relay's request-body limit (HTTP 413 at 1M tris)
    def run(packed, o, d, mode_s):
        keys = xla_traverse._sort_keys(o, d, bvh.node_min[0], bvh.node_max[0],
                                       mode=mode_s)
        # payload sort (round 5): 4x cheaper than argsort + row-gathers;
        # components stay separate all the way to the kernel
        srt = jax.lax.sort((keys, o[:, 0], o[:, 1], o[:, 2],
                            d[:, 0], d[:, 1], d[:, 2]), num_keys=1)
        return pt.traverse_packed(bvh, packed, srt[1:4], srt[4:7], mode=mode)

    # round-5 steady-state methodology (_steady_seconds)
    sum_j = jax.jit(lambda p, o, d: jnp.sum(jnp.minimum(
        run(p, o, d, mode_s="dir3")[0], jnp.float32(1e9))))
    perturbs = [o + np.float32(1e-6 * (k + 1)) for k in range(8)]
    jax.block_until_ready(perturbs)
    float(sum_j(packed, o, d))
    dt = _steady_seconds(lambda i: sum_j(packed, perturbs[i], d))
    mrays = n / dt / 1e6

    # Limit-model annotation (PARITY "Traversal-kernel limit model"): one
    # counted compile records fill iterations / pops / leaf visits; the
    # pops-free ceiling prices ONLY the dense leaf chunks at the measured
    # ~421 ns per 8-tri x 1024-ray chunk (fit range 335-507 across
    # leaf-size mixes; chunk cost sits at the VPU issue floor).
    B_CHUNK_NS = 421.0
    try:
        def run_counted(packed, o, d):
            keys = xla_traverse._sort_keys(o, d, bvh.node_min[0],
                                           bvh.node_max[0], mode="dir3")
            order = jnp.argsort(keys)
            return pt.traverse_packed(bvh, packed, o[order], d[order],
                                      mode=mode, count_steps=True)

        cout = jax.jit(run_counted)(packed, o, d)
        c = pt.count_decode(np.asarray(cout[2]),
                            pt.PACKET_ROWS * pt.INTERLEAVE)
        chunks = int(c["leaves"].sum()) * -(-bvh.leaf_size // 8)
        ceiling = n / (chunks * B_CHUNK_NS * 1e-9) / 1e6
        extra = dict(iters=int(c["iters"].sum()), pops=int(c["pops"].sum()),
                     leaf_visits=int(c["leaves"].sum()),
                     pct_pop_free_ceiling=round(100.0 * mrays / ceiling, 1))
    except Exception as e:  # counters must never fail the headline metric
        extra = dict(counter_error=f"{type(e).__name__}: {e}")
    _emit("mega_bvh_mrays", mrays, "Mrays/s", mrays / BASE_COURTYARD,
          tris=int(scene.geometry.tri_vidx.shape[0]), leaf_size=bvh.leaf_size,
          box_enc=str(mode), build_s=round(build_s, 1), **extra)


def bench_inverse(tt, key):
    import jax
    import jax.numpy as jnp
    import dataclasses
    from terra_tpu import optim

    _log("config 4: inverse-render step ...")
    scene_gt = tt.scenes.cornell_box(with_blocks=False)
    cam = tt.scenes.cornell_camera()
    opts = tt.RenderOptions(
        width=32, height=32, samples_per_pixel=8,
        bounces=2, integrator=tt.Integrator.DIRECT, rr_start_bounce=8,
    )
    import optax

    @jax.jit
    def make_target():
        return optim.render_mean_image(scene_gt, cam, opts, key, jnp.int32(0), 8)

    target = jax.lax.stop_gradient(make_target())
    attrs0 = scene_gt.materials.attrs.at[0, 0, :].set(jnp.asarray([0.3, 0.5, 0.6]))
    scene0 = dataclasses.replace(
        scene_gt, materials=dataclasses.replace(scene_gt.materials, attrs=attrs0))

    optimizer = optax.adam(3e-2)
    params = optim.extract_params(scene0, ("attrs",))
    state = optim.TrainState(params, optimizer.init(params), jnp.int32(0))
    step = optim.make_train_step(cam, opts, target, optimizer)
    state, loss = step(state, scene0, key)
    float(loss)  # host read = compile + warm completion proof
    steps = 20
    # chained state dependencies make the steps sequential; the HOST
    # round-trip of the final loss is the completion barrier (round-5
    # methodology: block_until_ready on unread outputs is not one)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = step(state, scene0, key)
    float(loss)
    ms = (time.perf_counter() - t0) / steps * 1e3
    _emit("inverse_step_ms", ms, "ms/step", BASE_INVERSE_MS / ms,
          final_loss=round(float(loss), 6))


def main():
    import jax  # noqa: F401  (device init before timing)
    import jax.numpy as jnp

    import terra_tpu as tt
    from terra_tpu.ops import rng as rng_mod

    k0, k1 = rng_mod.key_from_seed(0)
    key = jnp.array([k0, k1], jnp.uint32)

    for fn in (bench_cornell, bench_ggx_mis, bench_courtyard, bench_mega,
               bench_inverse):
        try:
            fn(tt, key)
        except Exception as e:  # keep later configs alive; record the failure
            _emit(fn.__name__, 0.0, "error", 0.0, error=f"{type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
