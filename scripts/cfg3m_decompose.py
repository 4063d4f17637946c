"""Config-3m time decomposition + kernel limit model (VERDICT r4 #2/#3).

Runs the counted kernel (count_steps: per-grid-step fill iterations,
do-gated pops, leaf visits, paged visits) on the 1M-tri mega scene at
several leaf sizes plus the 242k courtyard, times each, and fits

    time = A * iters  +  B * leaf_chunks  +  C * paged_visits

(least squares over the configs; iters is the serial scalar-loop length,
leaf_chunks = leaf_visits * ceil(leaf/8) dense 8-tri chunk tests, paged
visits each cost one 28-row HBM->VMEM DMA round-trip). A/B/C convert to
cycles at the v5e clock and against hand-counted op minimums -> the
%-of-ceiling limit model in docs/PARITY.md.

Run DIRECTLY on the TPU box, one process at a time (CLAUDE.md).
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


def rays_primary(cam, n=1 << 20):
    side = int(np.sqrt(n))
    px, py = jnp.meshgrid(jnp.arange(side), jnp.arange(side))
    px = px.reshape(-1).astype(jnp.float32)
    py = py.reshape(-1).astype(jnp.float32)
    zeros = jnp.zeros_like(px)
    return camera_mod.generate_rays(cam, side, side, px, py, 0.0, zeros, zeros)


def run_counted(scene, packed, o, d, sort_mode="dir3", reps=3, label="",
                count=True, gate=True):
    bvh = scene.bvh
    prows_kw = {}
    if len(packed) == 4:
        nodes = packed[0]
        res_bf16 = nodes.dtype == jnp.int32
        arity, enc = 4, "bf16" if res_bf16 else "f32"
        prows_kw = dict(paged_rows=packed[3],
                        s_resident=nodes.shape[0] // (12 if res_bf16 else 24))
        tables = packed[:3]
    else:
        mode = pt.wide_mode(bvh)
        arity, enc = (4, mode) if mode else (2, "f32")
        tables = packed
    packet_rows = pt.PACKET_ROWS * pt.INTERLEAVE

    def run(tables, o, d, *prows):
        keys = xla_traverse._sort_keys(o, d, bvh.node_min[0], bvh.node_max[0],
                                       mode=sort_mode)
        order = jnp.argsort(keys)
        kw = dict(prows_kw)
        if prows:
            kw["paged_rows"] = prows[0]
        return pt._traverse_pallas(bvh, *tables, o[order], d[order],
                                   packet_rows=packet_rows, ways=pt.INTERLEAVE,
                                   arity=arity, box_enc=enc,
                                   count_steps=count, **kw), order

    run_j = jax.jit(run)
    prows_arg = (packed[3],) if len(packed) == 4 else ()
    t0 = time.perf_counter()
    out, order = run_j(tables, o, d, *prows_arg)
    jax.block_until_ready(out[0])
    compile_s = time.perf_counter() - t0

    if gate:  # first 2048 sorted rays vs the XLA walk
        idx = np.asarray(order[:2048])
        ref = xla_traverse.raycast(scene, o[idx], d[idx])
        hk = np.asarray(out[0][:2048]) < T_FAR
        hx = np.asarray(ref.hit)
        assert (hk == hx).all(), f"{label}: GATE FAIL {(hk != hx).sum()}/2048"

    t0 = time.perf_counter()
    for _ in range(reps):
        out2 = run_j(tables, o, d, *prows_arg)
    jax.block_until_ready(out2[0][0])
    dt = (time.perf_counter() - t0) / reps
    n = o.shape[0]
    res = {"label": label, "mrays": n / dt / 1e6, "dt_ms": dt * 1e3,
           "compile_s": compile_s}
    if count:
        c = pt.count_decode(out[2], packet_rows)
        res.update({k: int(v.sum()) for k, v in c.items()})
        res["util"] = res["pops"] / max(res["iters"] * pt.INTERLEAVE, 1)
        res["grid_steps"] = len(c["iters"])
    print(f"  {label}: {res['mrays']:.2f} Mrays/s ({res['dt_ms']:.1f} ms)"
          + (f" iters={res['iters']} pops={res['pops']} leaves={res['leaves']}"
             f" paged={res['paged']} util={res['util']:.2f}" if count else "")
          + f" [compile {compile_s:.0f}s]", flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mega-leaf", type=int, nargs="*", default=[64, 48, 32])
    ap.add_argument("--courtyard", action="store_true")
    ap.add_argument("--paged-cap", type=int, default=0,
                    help="extra leaf-64 run paged at this resident cap")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    rows = []
    t0 = time.perf_counter()
    # host-side build + one transfer (op-by-op TPU dispatch through the
    # relay measured 300-860s for this scene vs ~5s on the host)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        scene0 = tt.scenes.courtyard(grid=690, columns=40)
    scene0 = jax.device_put(scene0, jax.devices()[0])
    jax.block_until_ready(scene0.bvh.node_min)
    print(f"mega scene: {int(scene0.geometry.tri_vidx.shape[0])} tris, "
          f"build {time.perf_counter() - t0:.1f}s", flush=True)
    cam = tt.scenes.courtyard_camera()
    o, d = rays_primary(cam)

    for leaf in args.mega_leaf:
        t0 = time.perf_counter()
        if leaf != scene0.bvh.leaf_size:
            with jax.default_device(cpu):
                bvh = lbvh.build(jax.device_put(scene0.geometry, cpu),
                                 leaf_size=leaf)
            scene = dataclasses.replace(
                scene0, bvh=jax.device_put(bvh, jax.devices()[0]))
        else:
            scene = scene0
        jax.block_until_ready(scene.bvh.node_min)
        mode = pt.wide_mode(scene.bvh)
        print(f"leaf {leaf}: wide {scene.bvh.num_wide} mode {mode} "
              f"(rebuild {time.perf_counter() - t0:.1f}s)", flush=True)
        corners = scene.geometry.corners()
        packed = pt.pack_tables_auto(scene.bvh, *corners)
        r = run_counted(scene, packed, o, d, label=f"mega leaf{leaf} {mode}",
                        reps=args.reps)
        r.update(leaf=leaf, mode=str(mode))
        rows.append(r)
        if leaf == 64 and args.paged_cap:
            packed_p = pt.pack_tables_paged(scene.bvh, *corners,
                                            resident_cap=args.paged_cap)
            r = run_counted(scene, packed_p, o, d, reps=args.reps,
                            label=f"mega leaf64 paged cap{args.paged_cap}")
            r.update(leaf=64, mode="paged-forced")
            rows.append(r)
        if leaf == 64:
            # uncounted control: counter overhead calibration
            r = run_counted(scene, packed, o, d, count=False, gate=False,
                            reps=args.reps, label=f"mega leaf{leaf} UNcounted")
            r.update(leaf=leaf, mode=f"{mode}-uncounted")
            rows.append(r)

    if args.courtyard:
        scene = tt.scenes.courtyard()
        cam2 = tt.scenes.courtyard_camera()
        o2, d2 = rays_primary(cam2)
        corners = scene.geometry.corners()
        packed = pt.pack_tables_auto(scene.bvh, *corners)
        mode = pt.wide_mode(scene.bvh)
        print(f"courtyard: leaf {scene.bvh.leaf_size} wide {scene.bvh.num_wide} "
              f"mode {mode}", flush=True)
        r = run_counted(scene, packed, o2, d2,
                        label=f"courtyard leaf{scene.bvh.leaf_size} {mode}",
                        reps=args.reps)
        r.update(leaf=scene.bvh.leaf_size, mode=str(mode))
        rows.append(r)

    # least-squares fit over counted rows: dt = A*iters + B*chunks + C*paged
    fit_rows = [r for r in rows if "iters" in r]
    M = np.array([[r["iters"], r["leaves"] * -(-r["leaf"] // 8), r["paged"]]
                  for r in fit_rows], float)
    y = np.array([r["dt_ms"] * 1e-3 for r in fit_rows])
    coef, res_, *_ = np.linalg.lstsq(M, y, rcond=None)
    pred = M @ coef
    print("\nfit dt = A*iters + B*chunks + C*paged")
    print(f"  A = {coef[0] * 1e9:.1f} ns/iter  B = {coef[1] * 1e9:.1f} ns/chunk  "
          f"C = {coef[2] * 1e9:.1f} ns/paged-visit")
    clk = 0.94e9  # v5e core clock
    print(f"  = {coef[0] * clk:.0f} cyc/iter, {coef[1] * clk:.0f} cyc/chunk, "
          f"{coef[2] * clk:.0f} cyc/paged-visit")
    for r, p in zip(fit_rows, pred):
        share = (r["iters"] * coef[0], r["leaves"] * -(-r["leaf"] // 8) * coef[1],
                 r["paged"] * coef[2])
        tot = sum(share)
        print(f"  {r['label']}: measured {r['dt_ms']:.1f} ms, model {p * 1e3:.1f} ms"
              f" | pops {share[0]/tot:.0%} leaves {share[1]/tot:.0%} "
              f"paged {share[2]/tot:.0%}")


if __name__ == "__main__":
    main()
