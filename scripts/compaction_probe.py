"""Two-phase (subtree-compacted) traversal: OFFLINE economics probe.

demand_probe.py measured the dilation structure of the 3m workload:
perfect demand 1.65 leaves/ray, row(128) union 7.94, way(1024) union
17.26 — a 2.2x dense-work bound at row granularity, unreachable by
resorting alone (any 1024-lane dense granularity pays the way union).

The candidate design: cut the wide tree at ~M-leaf subtrees; phase 1
walks the top at way granularity and emits (ray, subtree) pairs; phase 2
re-sorts pairs by subtree and traverses each subtree with NARROW
(1-2 row) ways whose start node is the subtree root (pops stay confined
to the subtree, so narrow ways don't pay the full-tree pop explosion
that sank (1,8) packets in round 3), 2a on the nearest subtree then 2b
on surviving pairs seeded with 2a's best t.

This probe builds the frontier and SIMULATES the phase structure in
numpy/XLA from exact box tests — no kernels — to price:
  - frontier size F and top-tree pops (phase-1 cost)
  - pair counts: nearest (=rays) + 2b survivors after best-t culling
  - per-row leaf unions WITHIN the assigned subtree after the pair sort
    (the dense work phase 2 actually pays), at row sizes 128/256
  - padding overhead of per-subtree row alignment

Run ON the TPU box: python scripts/compaction_probe.py
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def build_frontier(bvh, M: int):
    """Frontier of the wide tree: maximal subtrees with <= M binary
    leaves. Returns (roots, leafcount) where roots are start LINKS in the
    kernel's encoding (wide id < W, or W + leaf_id for singleton-leaf
    subtrees hanging above the cut)."""
    W = int(bvh.num_wide)
    child = np.asarray(bvh.wide_child)  # (W, 4), -1 = empty
    # subtree binary-leaf counts, children have larger ids than parents in
    # the overlay? not guaranteed -> iterate to fixpoint from the leaves
    cnt = np.zeros(W, np.int64)
    pend = [(0, False)]
    stack = [0]
    # post-order via explicit stack
    state = np.zeros(W, np.int8)
    order = []
    stack = [0]
    while stack:
        n = stack.pop()
        if n < 0:
            order.append(~n)
            continue
        stack.append(~n)
        for c in child[n]:
            if 0 <= c < W:
                stack.append(int(c))
    for n in order:
        s = 0
        for c in child[n]:
            if c < 0:
                continue
            s += cnt[c] if c < W else 1
        cnt[n] = s

    roots = []
    sizes = []
    stack = [0]
    while stack:
        n = stack.pop()
        if cnt[n] <= M:
            roots.append(n)
            sizes.append(cnt[n])
            continue
        for c in child[n]:
            if c < 0:
                continue
            if c >= W:          # singleton leaf above the cut
                roots.append(int(c))
                sizes.append(1)
            elif cnt[c] <= M:
                roots.append(int(c))
                sizes.append(int(cnt[c]))
            else:
                stack.append(int(c))
    return np.asarray(roots, np.int64), np.asarray(sizes, np.int64), cnt


def subtree_leafsets(bvh, roots):
    """For each frontier root, the set of binary-leaf ids under it, and
    a leaf -> subtree id map."""
    W = int(bvh.num_wide)
    child = np.asarray(bvh.wide_child)
    L = int(bvh.num_leaves)
    leaf2sub = np.full(L, -1, np.int64)
    for fid, r in enumerate(roots):
        if r >= W:
            leaf2sub[r - W] = fid
            continue
        stack = [int(r)]
        while stack:
            n = stack.pop()
            for c in child[n]:
                if c < 0:
                    continue
                if c >= W:
                    leaf2sub[c - W] = fid
                else:
                    stack.append(int(c))
    assert (leaf2sub >= 0).all()
    return leaf2sub


def subtree_boxes(bvh, roots):
    """(F, 6) union box per frontier root (from the live binary boxes via
    wide_src for internal roots; the leaf box itself for singletons)."""
    W = int(bvh.num_wide)
    ni = int(bvh.num_internal)
    nmin = np.asarray(bvh.node_min)
    nmax = np.asarray(bvh.node_max)
    src = np.asarray(bvh.wide_src)  # (W, 4) binary ids, -1 empty
    F = len(roots)
    bmin = np.zeros((F, 3), np.float32)
    bmax = np.zeros((F, 3), np.float32)
    for fid, r in enumerate(roots):
        if r >= W:
            b = ni + (r - W)
            bmin[fid] = nmin[b]
            bmax[fid] = nmax[b]
        else:
            s = src[r]
            s = s[s >= 0]
            bmin[fid] = nmin[s].min(axis=0)
            bmax[fid] = nmax[s].max(axis=0)
    return bmin, bmax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 18)
    ap.add_argument("--grid", type=int, default=690)
    ap.add_argument("--M", type=int, nargs="*", default=[24, 48, 96])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import terra_tpu as tt
    from terra_tpu import camera as camera_mod
    from terra_tpu.accel import pallas_traverse as pt
    from terra_tpu.accel import traverse as xla_traverse
    from terra_tpu.intersect import T_FAR

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        scene = tt.scenes.courtyard(grid=args.grid, columns=40)
    scene = jax.device_put(scene, jax.devices()[0])
    jax.block_until_ready(scene.bvh.node_min)
    bvh = scene.bvh
    ni, L, W = int(bvh.num_internal), int(bvh.num_leaves), int(bvh.num_wide)
    ls = int(bvh.leaf_size)
    print(f"tris={int(scene.geometry.tri_vidx.shape[0])} leaves={L} "
          f"leaf_size={ls} wide={W}", flush=True)

    n = 1 << 20
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
    o = o[order][: args.rays]
    d = d[order][: args.rays]

    packed = pt.pack_tables_auto(bvh, *scene.geometry.corners())
    hit = jax.jit(lambda p, o, d: pt.raycast(
        scene, o, d, packed=p, sort_rays=False))(packed, o, d)
    jax.block_until_ready(hit.t)
    tt_hit = np.asarray(jnp.where(hit.hit, hit.t, T_FAR))

    on = np.asarray(o)
    dn = np.asarray(d)
    lmin = np.asarray(bvh.node_min[ni:ni + L])
    lmax = np.asarray(bvh.node_max[ni:ni + L])

    def entries(bmin, bmax, ob, db):
        """(B, F) entry t (inf on miss) via numpy blocked math."""
        inv = np.where(np.abs(db) > 1e-12, 1.0 / db, 1e12).astype(np.float32)
        t1 = (bmin[None] - ob[:, None]) * inv[:, None]
        t2 = (bmax[None] - ob[:, None]) * inv[:, None]
        tmin = np.minimum(t1, t2).max(axis=2)
        tmax = np.maximum(t1, t2).min(axis=2)
        ok = tmax >= np.maximum(tmin, 0.0)
        return np.where(ok, tmin, np.inf)

    N = args.rays
    B = 8192
    for M in args.M:
        t0 = time.perf_counter()
        roots, sizes, cnt = build_frontier(bvh, M)
        leaf2sub = subtree_leafsets(bvh, roots)
        smin, smax = subtree_boxes(bvh, roots)
        F = len(roots)
        # top-tree internal nodes = wide nodes with cnt > M reachable
        top_nodes = int((cnt > M).sum())
        print(f"\n== M={M}: F={F} subtrees (sizes p50 "
              f"{np.percentile(sizes,50):.0f} max {sizes.max()}), "
              f"top internal nodes {top_nodes} "
              f"[frontier build {time.perf_counter()-t0:.1f}s]", flush=True)

        nearest = np.full(N, -1, np.int64)
        n_dem = np.zeros(N, np.int64)       # terminated subtree demand
        n_unt = np.zeros(N, np.int64)       # unterminated (phase-1 visits)
        pairs_r = []
        pairs_f = []
        for i in range(0, N, B):
            sl = slice(i, min(i + B, N))
            e = entries(smin, smax, on[sl], dn[sl])      # (B, F)
            ec = np.maximum(e, 0.0)                      # clamped entry
            dem = e <= tt_hit[sl, None]
            n_dem[sl] = dem.sum(axis=1)
            n_unt[sl] = (e < np.inf).sum(axis=1)
            nearest[sl] = np.argmin(np.where(dem, ec, np.inf), axis=1)
            rr, ff = np.nonzero(dem)
            pairs_r.append(rr + i)
            pairs_f.append(ff)
        pr = np.concatenate(pairs_r)
        pf = np.concatenate(pairs_f)
        print(f"  subtree demand/ray: terminated {n_dem.mean():.2f} "
              f"unterminated {n_unt.mean():.2f} (phase-1 emits these) "
              f"p99 {np.percentile(n_unt,99):.0f} max {n_unt.max()}")
        print(f"  ideal-cull pair lanes = {len(pr)} ({len(pr)/N:.2f}/ray); "
              f"nearest-degeneracy: top fid covers "
              f"{np.bincount(nearest[nearest>=0]).max()/N:.1%} of rays")

        # ---- phase-2 dense work under IDEAL best-t culling: ALL
        # terminated pairs, sorted by subtree, padded per subtree to row
        # multiples; per row, the dense work is the union of member rays'
        # leaf demand WITHIN that subtree (x CH chunks each)
        CH = -(-ls // 8)
        sub_leaves = [np.nonzero(leaf2sub == f)[0] for f in range(F)]
        for rowsz in (128, 256):
            ordp = np.lexsort((pr, pf))
            sp_r = pr[ordp]
            sp_f = pf[ordp]
            rows = 0
            chunks = 0
            pad = 0
            start = 0
            P = len(sp_r)
            while start < P:
                end = start
                f0 = sp_f[start]
                while end < P and sp_f[end] == f0:
                    end += 1
                grp = sp_r[start:end]
                g = len(grp)
                nrows = -(-g // rowsz)
                pad += nrows * rowsz - g
                lids = sub_leaves[f0]
                e = entries(lmin[lids], lmax[lids], on[grp], dn[grp])
                dm = e <= tt_hit[grp, None]
                for r0 in range(0, g, rowsz):
                    u = dm[r0:r0 + rowsz].any(axis=0).sum()
                    chunks += int(u) * CH
                rows += nrows
                start = end
            r = rowsz // 128
            print(f"  phase2 rowsz={rowsz}: rows {rows} pad {pad} "
                  f"({pad/P:.1%} of {P} pairs), union-chunks {chunks} "
                  f"-> dense {chunks*(45+47*r)*1e-6:.2f}.."
                  f"{chunks*(20+47*r)*1e-6:.2f} ms/{N/1e6:.2f}Mray "
                  f"(hi..lo fixed)")
        # current dense baseline for the same rays: way(1024) unions of the
        # full tree
        cur_chunks = 0
        for i in range(0, N, 1024):
            sl = slice(i, min(i + 1024, N))
            e = entries(lmin, lmax, on[sl], dn[sl])
            dm = e <= tt_hit[sl, None]
            u = dm.any(axis=0).sum()
            cur_chunks += int(u) * CH
        print(f"  current dense: {cur_chunks} chunks -> "
              f"{cur_chunks*421*1e-6:.2f} ms/{N/1e6:.2f}Mray")


if __name__ == "__main__":
    main()
