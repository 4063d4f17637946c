"""Two-phase subtree-compacted traversal (round 5).

The measured wall for big scenes (docs/PARITY.md "limit model") is SIMD
packet dilation of the dense leaf test: at 1M tris a 1024-lane packet
visits 17.3 leaves while a single ray needs 1.65 — and resorting cannot
help at 1024-lane granularity (the union is geometric). 128-lane rows
bound the union at 7.94, but narrow packets on the full tree pay a pop
explosion (round-3 measured (1,8) at 0.41x), and sub-packet predication
costs ~300 cycles per `pl.when` on this toolchain (round-5 row-mask
negatives).

This module cuts the dilation itself, in the spirit of the wavefront
ray-queue compaction the reference cannot express either (its traversal
is per-ray scalar, TerraBVH.c:250-310 — per-ray is the zero-dilation
limit this converges toward):

  1. The wide tree is cut into ~``max_leaves``-leaf SUBTREES (frontier).
  2. Phase 1 slab-tests every ray against the F frontier boxes (dense
     VPU work, no traversal) and EXTRACTS per-ray (subtree, entry) pairs
     in entry order — not by sorting, but by repeated lexicographic
     (entry_key, fid) min-reduction passes, two reductions per rank.
  3. Phase 2 processes pairs in entry-ranked ROUNDS: pairs are sorted by
     subtree, padded per subtree to 128-lane rows, and traversed by the
     production Pallas kernel with NARROW (1-2 row) ways whose stack is
     seeded with the subtree root (``start_links``) — pops stay confined
     to the subtree, so narrow ways do not pay the full-tree descent —
     and whose best-t is seeded with the ray's current best (``t_max``),
     so every round prunes against all earlier rounds.
  4. A scatter-min merge folds each round into per-ray (t, tri); rounds
     repeat until no pair survives the best-t cull. Termination
     semantics are therefore EXACT: a pair is dropped only when its box
     entry >= the ray's proven best hit.

Offline economics (scripts/demand_probe.py, scripts/compaction_probe.py,
131k sorted primaries on the 1M-tri scene): ideal-cull pairs 2.13/ray,
phase-2 dense work 2.5x below the classic way-granular kernel.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..intersect import RayHit, T_FAR
from . import pallas_traverse as pt

TRI_BIG = jnp.int32(1 << 24)
KEY_INF = jnp.int32(0x7F800000)  # +inf bit pattern: sortable-int top


class Frontier(NamedTuple):
    """Subtree cut of the BVH4 overlay (host-built once per commit)."""
    roots: jnp.ndarray   # (F,) i32 start links: wide id, or W + leaf_id
    bmin: jnp.ndarray    # (F, 3) f32 subtree bounds
    bmax: jnp.ndarray    # (F, 3)


def build_frontier(bvh, max_leaves: int = 128) -> Frontier:
    """Maximal wide-tree subtrees with <= max_leaves binary leaves.
    Singleton leaves hanging above the cut become their own subtree
    (their start link is the stack's native leaf encoding)."""
    W = int(bvh.num_wide)
    ni = int(bvh.num_internal)
    child = np.asarray(bvh.wide_child)          # (W, 4), -1 = empty
    src = np.asarray(bvh.wide_src)              # (W, 4) binary ids
    nmin = np.asarray(bvh.node_min)
    nmax = np.asarray(bvh.node_max)

    # post-order leaf counts
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
    cnt = np.zeros(W, np.int64)
    for n in order:
        s = 0
        for c in child[n]:
            if c >= W:
                s += 1
            elif c >= 0:
                s += cnt[c]
        cnt[n] = s

    roots: list[int] = []
    stack = [0]
    while stack:
        n = stack.pop()
        if cnt[n] <= max_leaves:
            roots.append(n)
            continue
        for c in child[n]:
            if c < 0:
                continue
            if c >= W or cnt[c] <= max_leaves:
                roots.append(int(c))
            else:
                stack.append(int(c))

    F = len(roots)
    bmin = np.empty((F, 3), np.float32)
    bmax = np.empty((F, 3), np.float32)
    for i, r in enumerate(roots):
        if r >= W:
            b = ni + (r - W)
            bmin[i] = nmin[b]
            bmax[i] = nmax[b]
        else:
            s = src[r]
            s = s[s >= 0]
            bmin[i] = nmin[s].min(axis=0)
            bmax[i] = nmax[s].max(axis=0)
    return Frontier(jnp.asarray(np.asarray(roots, np.int32)),
                    jnp.asarray(bmin), jnp.asarray(bmax))


def _entry_keys(fr: Frontier, o, d):
    """(B, F) sortable-int entry keys: bitcast of clamped (>=0) box entry
    t, KEY_INF on miss. Non-negative IEEE754 floats order-preserve as
    int32, so lexicographic (key, fid) ranking runs on the VPU with no
    sorts."""
    inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 1e12)
    t1 = (fr.bmin[None] - o[:, None]) * inv[:, None]   # (B, F, 3)
    t2 = (fr.bmax[None] - o[:, None]) * inv[:, None]
    tmin = jnp.max(jnp.minimum(t1, t2), axis=2)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=2)
    ok = tmax >= jnp.maximum(tmin, 0.0)
    e = jnp.maximum(tmin, 0.0)
    key = jax.lax.bitcast_convert_type(e, jnp.int32)
    return jnp.where(ok, key, KEY_INF)


def _rank_mins(keys, prev_key, prev_fid, n_out: int):
    """First ``n_out`` (key, fid) pairs strictly after (prev_key,
    prev_fid) in lexicographic order, per row of ``keys`` (B, F)."""
    B, F = keys.shape
    fids = jax.lax.broadcasted_iota(jnp.int32, (B, F), 1)
    out = []
    pk, pf = prev_key, prev_fid
    for _ in range(n_out):
        cand = (keys > pk[:, None]) | (
            (keys == pk[:, None]) & (fids > pf[:, None]))
        k1 = jnp.min(jnp.where(cand, keys, KEY_INF), axis=1)
        at = cand & (keys == k1[:, None])
        f1 = jnp.min(jnp.where(at, fids, jnp.int32(1 << 30)), axis=1)
        f1 = jnp.where(k1 == KEY_INF, -1, f1)
        out.append((k1, f1))
        pk, pf = k1, f1
    return out


def first_ranks(fr: Frontier, o, d, n_out: int = 2, block: int = 16384):
    """Blocked phase-1 sweep: per-ray first ``n_out`` (entry_key, fid)
    pairs in entry order."""
    n = o.shape[0]
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        o = jnp.concatenate([o, jnp.full((pad, 3), 1e8, o.dtype)])
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.float32(0.5773503), (pad, 3))])

    def f(args):
        ob, db = args
        ks = _entry_keys(fr, ob, db)
        neg = jnp.full((ob.shape[0],), jnp.int32(-(1 << 30)))
        outs = _rank_mins(ks, neg, neg, n_out)
        return tuple(x for kf in outs for x in kf)

    res = jax.lax.map(f, (o.reshape(nb, block, 3), d.reshape(nb, block, 3)))
    return [r.reshape(-1)[:n] for r in res]


def next_rank(fr: Frontier, o, d, prev_key, prev_fid, block: int = 16384):
    """Blocked single-rank extraction for the tail rounds."""
    n = o.shape[0]
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        o = jnp.concatenate([o, jnp.full((pad, 3), 1e8, o.dtype)])
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.float32(0.5773503), (pad, 3))])
        prev_key = jnp.concatenate([prev_key, jnp.full((pad,), KEY_INF)])
        prev_fid = jnp.concatenate([prev_fid, jnp.zeros((pad,), jnp.int32)])

    def f(args):
        ob, db, pk, pf = args
        ks = _entry_keys(fr, ob, db)
        (k1, f1), = _rank_mins(ks, pk, pf, 1)
        return k1, f1

    k, fi = jax.lax.map(f, (o.reshape(nb, block, 3), d.reshape(nb, block, 3),
                            prev_key.reshape(nb, block),
                            prev_fid.reshape(nb, block)))
    return k.reshape(-1)[:n], fi.reshape(-1)[:n]


def pack_round(rid, fid, valid, o, d, best_t, roots, F: int, cap: int,
               rowsz: int = 128):
    """Scatter a round's valid pairs into a per-subtree row-padded launch
    layout of static size ``cap`` (multiple of rowsz).

    Returns (o_p, d_p, seed_p, rid_p, starts) where starts has one link
    per rowsz-lane row (pad rows get root 0 with all-dead lanes)."""
    n = rid.shape[0]
    skey = jnp.where(valid, fid, jnp.int32(1 << 30))
    order = jnp.argsort(skey)                 # valid pairs first, by fid
    rid_s = rid[order]
    fid_s = jnp.where(valid[order], fid[order], F)  # sentinel group F
    counts = jnp.bincount(fid_s, length=F + 1)[:F]  # valid only
    padded = -(-counts // rowsz) * rowsz
    offs = jnp.concatenate([jnp.zeros((1,), padded.dtype),
                            jnp.cumsum(padded)])[:-1]
    first = jnp.concatenate([jnp.zeros((1,), counts.dtype),
                             jnp.cumsum(counts)])[:-1]
    i = jnp.arange(n, dtype=jnp.int32)
    pos = offs[jnp.minimum(fid_s, F - 1)] + (i - first[jnp.minimum(fid_s, F - 1)])
    pos = jnp.where(fid_s >= F, cap - 1, pos)  # invalid pairs -> dump slot
    pos = jnp.minimum(pos, cap - 1)

    o_p = jnp.full((cap, 3), 1e8, jnp.float32).at[pos].set(
        o[rid_s], mode="drop")
    d_p = jnp.full((cap, 3), 0.5773503, jnp.float32).at[pos].set(
        d[rid_s], mode="drop")
    seed_p = jnp.zeros((cap,), jnp.float32).at[pos].set(
        best_t[rid_s], mode="drop")
    rid_p = jnp.zeros((cap,), jnp.int32).at[pos].set(rid_s, mode="drop")
    live = jnp.zeros((cap,), jnp.bool_).at[pos].set(valid[order], mode="drop")
    # the dump slot collected arbitrary invalid pairs: kill it
    o_p = o_p.at[cap - 1].set(jnp.full((3,), 1e8, jnp.float32))
    d_p = d_p.at[cap - 1].set(jnp.full((3,), 0.5773503, jnp.float32))
    seed_p = seed_p.at[cap - 1].set(0.0)
    live = live.at[cap - 1].set(False)
    seed_p = jnp.where(live, seed_p, 0.0)

    nrows = cap // rowsz
    row0 = jnp.arange(nrows, dtype=jnp.int32) * rowsz
    grp = jnp.searchsorted(offs, row0, side="right").astype(jnp.int32) - 1
    in_data = row0 < (offs + padded)[jnp.maximum(grp, 0)]
    starts = jnp.where(in_data, roots[jnp.clip(grp, 0, F - 1)], 0)
    return o_p, d_p, seed_p, rid_p, live, starts


def merge_round(best_t, best_i, rid_p, live, seed_p, t_ret, i_ret):
    """Exact scatter-min fold of a round's results into (t, tri)."""
    found = live & (t_ret < seed_p)
    t_eff = jnp.where(found, t_ret, jnp.float32(np.inf))
    b2 = best_t.at[rid_p].min(t_eff)
    cand = jnp.where(found & (t_eff <= b2[rid_p]), i_ret, TRI_BIG)
    tmin = jnp.full_like(best_i, TRI_BIG).at[rid_p].min(cand)
    upd = b2 < best_t
    return b2, jnp.where(upd & (tmin < TRI_BIG), tmin, best_i)


def raycast_compact(bvh, packed, fr: Frontier, o, d,
                    rows_pp: int = 1, ways: int = 8, rowsz: int = 128,
                    max_rounds: int = 24, interpret: bool = False,
                    algo: str = "mt", block: int = 16384,
                    tail_buckets=(1, 8, 64)):
    """Closest-hit via the compacted two-phase pipeline. The per-round
    device work (pack + kernel launch + merge, and the tail extraction)
    is fused into per-shape jitted segments (cached across calls); only
    the round-loop control and the active-ray count sync run on the host.

    ``packed`` is a resident table set from pack_tables_wide (f32 or
    bf16); paged tables are not supported (compaction targets scenes
    whose tables fit — at 1M tris the bf16 overlay is resident)."""
    assert len(packed) == 3, "compact path needs resident wide tables"
    assert rowsz == rows_pp * 128, "row padding must match the way shape"
    nodes, links, tris = packed
    box_enc = "bf16" if nodes.dtype == jnp.int32 else "f32"
    F = int(fr.roots.shape[0])
    n = o.shape[0]
    blk = rows_pp * 128 * ways
    cap0 = (n + F * rowsz + blk - 1) // blk * blk
    statics = (int(bvh.num_wide), int(bvh.num_leaves), int(bvh.leaf_size),
               int(bvh.wide_depth), rows_pp, ways, box_enc, algo, interpret)

    phase1 = _phase1_fn(F, min(block, n))
    rnd = _round_fn(statics, F, cap0, rowsz)
    k1, f1, k2, f2, best_t, best_i, pk, pf, rid = phase1(fr, o, d)

    # rounds 0/1: rank-0 then rank-1 pairs (same shapes -> one compile)
    best_t, best_i = rnd(nodes, links, tris, fr.roots, o, d,
                         best_t, best_i, rid, f1, k1)
    best_t, best_i = rnd(nodes, links, tris, fr.roots, o, d,
                         best_t, best_i, rid, f2, k2)
    pk = jnp.where(f2 >= 0, k2, KEY_INF)
    pf = jnp.where(f2 >= 0, f2, jnp.int32(1 << 30))

    # tail rounds: extract the next rank for still-active rays only — a
    # ray stays active while its last rank still had a pair below its
    # proven best (ranks are entry-ordered => that test is exhaustive)
    act = np.nonzero(np.asarray(_active_fn()(pk, best_t)))[0]
    for _ in range(max_rounds - 2):
        if act.size == 0:
            break
        a_cap = _bucket(act.size, n, tail_buckets, blk)
        idx = np.zeros((a_cap,), np.int32)
        idx[: act.size] = act
        idxd = jnp.asarray(idx)
        nact = jnp.int32(act.size)
        tail = _tail_fn(statics, F, a_cap,
                        (a_cap + F * rowsz + blk - 1) // blk * blk,
                        rowsz, min(block, a_cap))
        best_t, best_i, pk, pf, still = tail(
            nodes, links, tris, fr, o, d, best_t, best_i, pk, pf,
            idxd, nact)
        act = np.asarray(idxd)[np.asarray(still)]

    hit = best_t < T_FAR
    return RayHit(t=jax.lax.stop_gradient(best_t),
                  tri=jax.lax.stop_gradient(jnp.where(hit, best_i, 0)),
                  hit=hit)


@functools.lru_cache(maxsize=None)
def _phase1_fn(F: int, block: int):
    @jax.jit
    def f(fr, o, d):
        n = o.shape[0]
        k1, f1, k2, f2 = first_ranks(fr, o, d, 2, block=block)
        best_t = jnp.full((n,), T_FAR, jnp.float32)
        best_i = jnp.zeros((n,), jnp.int32)
        pk = jnp.full((n,), KEY_INF)
        pf = jnp.zeros((n,), jnp.int32)
        rid = jnp.arange(n, dtype=jnp.int32)
        return k1, f1, k2, f2, best_t, best_i, pk, pf, rid

    return f


@functools.lru_cache(maxsize=None)
def _active_fn():
    @jax.jit
    def f(pk, best_t):
        e = jax.lax.bitcast_convert_type(pk, jnp.float32)
        return (pk != KEY_INF) & (e < best_t)

    return f


@functools.lru_cache(maxsize=None)
def _round_fn(statics, F: int, cap: int, rowsz: int):
    """One fused compaction round: cull -> pack -> kernel -> merge."""
    launch = _launch_fn(*statics)

    @jax.jit
    def f(nodes, links, tris, roots, o, d, best_t, best_i, rid, fid, key):
        e = jax.lax.bitcast_convert_type(key, jnp.float32)
        valid = (fid >= 0) & (e < best_t)
        o_p, d_p, seed_p, rid_p, live, starts = pack_round(
            rid, jnp.maximum(fid, 0), valid, o, d, best_t, roots, F,
            cap, rowsz)
        t_r, i_r = launch(nodes, links, tris, o_p, d_p, seed_p, starts)
        return merge_round(best_t, best_i, rid_p, live, seed_p, t_r, i_r)

    return f


@functools.lru_cache(maxsize=None)
def _tail_fn(statics, F: int, a_cap: int, cap: int, rowsz: int, block: int):
    """Fused tail round: gather actives -> next-rank extraction -> cull
    -> pack -> kernel -> merge -> next active mask."""
    launch = _launch_fn(*statics)

    @jax.jit
    def f(nodes, links, tris, fr, o, d, best_t, best_i, pk, pf, idxd, nact):
        amask = jnp.arange(a_cap) < nact
        ka, fa = next_rank(fr, o[idxd], d[idxd],
                           jnp.where(amask, pk[idxd], KEY_INF),
                           jnp.where(amask, pf[idxd], jnp.int32(1 << 30)),
                           block=block)
        ea = jax.lax.bitcast_convert_type(ka, jnp.float32)
        has = amask & (fa >= 0)
        valid = has & (ea < best_t[idxd])
        o_p, d_p, seed_p, rid_p, live, starts = pack_round(
            idxd, jnp.maximum(fa, 0), valid, o, d, best_t, fr.roots, F,
            cap, rowsz)
        t_r, i_r = launch(nodes, links, tris, o_p, d_p, seed_p, starts)
        best_t, best_i = merge_round(best_t, best_i, rid_p, live, seed_p,
                                     t_r, i_r)
        pk = pk.at[idxd].set(jnp.where(amask, ka, pk[idxd]))
        pf = pf.at[idxd].set(jnp.where(amask, fa, pf[idxd]))
        still = has & (ea < best_t[idxd])
        return best_t, best_i, pk, pf, still

    return f


def _bucket(size: int, n: int, divs, blk: int) -> int:
    for dv in reversed(divs):
        c = -(-n // dv)
        if size <= c:
            return -(-c // blk) * blk
    return -(-n // blk) * blk


@functools.lru_cache(maxsize=None)
def _launch_fn(num_wide, num_leaves, leaf_size, wide_depth,
               rows_pp, ways, box_enc, algo, interpret):
    """Phase-2 kernel launcher on the STATIC kernel parameters (called
    inside the fused round jits). The shim carries only what
    _traverse_pallas reads statically from the bvh."""
    import types

    shim = types.SimpleNamespace(
        num_wide=num_wide, num_internal=num_wide, num_leaves=num_leaves,
        leaf_size=leaf_size, depth=wide_depth * 2, wide_depth=wide_depth)

    def f(nodes, links, tris, o_p, d_p, seed_p, starts):
        return pt._traverse_pallas(
            shim, nodes, links, tris, o_p, d_p, interpret,
            packet_rows=rows_pp * ways, ways=ways, arity=4,
            box_enc=box_enc, algo=algo, t_max=seed_p, start_links=starts)

    return f
