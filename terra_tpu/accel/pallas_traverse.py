"""Pallas TPU kernel: ordered-stack BVH packet traversal.

The north-star kernel (BASELINE.json: "stackless LBVH Pallas kernel over an
HBM-resident flattened node/triangle buffer"): the reference's per-ray
stack traversal (/root/reference/src/TerraBVH.c:250-310) re-architected for
the TPU memory system:

  * node boxes and child links live in SMEM (scalar memory) as flat
    arrays — box fields and child ids are plain scalar loads feeding the
    scalar traversal loop and broadcasting into the vector slab test.
    This removes ~14 VPU->scalar one-hot extraction round trips per node
    visit (measured ~65 cycles each on v5e) that an earlier VMEM-row
    layout paid; the packet AABB test needs exactly ONE cross-lane
    reduction per child (the masked entry-t min; any-hit is entry<FAR);
  * triangle corner data stays in HBM ((C*L, 128) f32 — one 128-lane row
    per leaf slot, tri ids float-encoded into lane 9) — leaf working sets
    scale with the scene while VMEM usage stays constant;
  * visited leaves are NOT intersected inline: their ids go into a small
    SMEM queue, and when the queue fills the kernel issues ALL of the
    queued leaves' HBM->VMEM DMAs back-to-back and only then starts
    waiting — so up to ``QUEUE`` copies are in flight and each wait
    overlaps the previous slot's dense intersection test. This replaces
    the round-1 scheme (one DMA issued unconditionally per stack pop,
    waited within the same pop: a single copy in flight AND wasted
    bandwidth on every internal-node pop);
  * each grid step owns a packet of 1024 rays as (8, 128) component
    planes; AABB and triangle tests are dense VPU ops. The leaf test
    shares ``intersect.mt_components`` / ``watertight_components`` with
    the XLA paths, so ``RenderOptions.intersector`` selects Moller-
    Trumbore or the Wald2013 watertight kernel *inside* the Pallas path
    (the reference runs its watertight test inside its hot traversal too,
    TerraGeometry.c:159-259 via TerraBVH.c:283);
  * traversal control flow is scalar (lax.while_loop + pl.when; lax.cond
    hangs the Mosaic compiler here) with a REAL ordered stack in SMEM:
    children are pushed far-first so the near subtree is visited first
    and per-ray best-t prunes the far one — the property the XLA
    skip-link walk (traverse.py) cannot express.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..intersect import RayHit, T_FAR, mt_components, watertight_components

__all__ = ["raycast", "pack_tables", "PACKET", "QUEUE"]

PACKET = 1024    # rays per packet: (8, 128) f32 register planes
PACKET_ROWS = 8  # sublane rows per packet (PACKET // 128)
# Packets traversing in lockstep per grid step. Measured sweep (76k tris,
# dir3-primary / octant-incoherent Mrays/s): 1-way 28.4/2.08, 2-way
# 31.6/2.38, 4-way 35.1/2.59, 8-way 35.4/2.65 but octant-primary REGRESSES
# at 8 (26.6 -> 23.2; register/VMEM pressure). 4 is the sweet spot.
INTERLEAVE = 4
# Narrow-packet defaults for INCOHERENT batches (octant sort): rows per
# packet x interleaved ways. Placeholder = the coherent shape until the
# round-3 TPU sweep lands (narrow shapes selectable via packet_shape).
INCOH_ROWS = 8
INCOH_WAYS = 4
STACK_DEPTH = 160  # 96 covered every resident tree; paged drains push up
                   # to 4*npq more entries on top of the DFS bound
QUEUE = 4       # leaf DMAs in flight per drain round
# Leaf-test row bands (masked independently per leaf). MEASURED NEGATIVE at
# 2 on both 76k-primary (23.1 -> 17.8 Mrays/s) and incoherent (2.08 -> 1.68):
# the per-leaf slab test + pl.when branch overhead exceeds the skipped dense
# work at leaf_size 16. Kept selectable for re-evaluation with bigger leaves.
ROW_GROUPS = 1
EPS = np.float32(1e-4)
TRI_FIELDS = 128  # one full lane row per triangle: ax..cz (9), tri_id (9),
                  # rest pad — HBM rows must be 128-aligned for DMA slicing
# Left-link entries carry metadata in their high bits (node ids < 2^28):
# bits 28-29 = split axis, bit 30 = "left child is upper along the axis".
LINK_MASK = (1 << 28) - 1


def _kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            *refs,
            ni: int, num_leaves: int, leaf_size: int, algo: str,
            nq: int, row_groups: int = 2, push_mode: str = "entry",
            ways: int = 1, rows_pp: int = 8, arity: int = 2,
            box_enc: str = "f32",
            has_tmax: bool = False, any_hit: bool = False,
            count_steps: bool = False,
            s_resident: int = 0, npq: int = 0,
            row_mask: bool = False, pops_per_iter: int = 1,
            has_starts: bool = False):
    paged = npq > 0
    if has_tmax:
        tm_ref, refs = refs[0], refs[1:]
    nodes_ref, links_ref, tris_ref, *refs = refs
    prows_ref = starts_ref = None
    if paged:
        prows_ref, refs = refs[0], refs[1:]
    if has_starts:
        # per-WAY traversal start links (compacted two-phase mode): a flat
        # SMEM table with one start link per (grid step, way) — a wide
        # node id, or ni + leaf_id (the stack's own leaf encoding, which
        # the pop path queues for a dense test natively). program_id is
        # read HERE (outside run_scoped: interpret mode loses the grid
        # context inside the scoped body).
        starts_ref, refs = refs[0], refs[1:]
        _start_base = pl.program_id(0) * ways
    best_t_ref, best_i_ref, *rest = refs
    if count_steps:
        steps_ref, rest = rest[0], rest[1:]
    else:
        steps_ref = None
    if paged:
        tri_scratch, dma_sem, pg_scratch, pg_sem = rest
    else:
        tri_scratch, dma_sem = rest
        pg_scratch = pg_sem = None
    ox = ox_ref[...]
    oy = oy_ref[...]
    oz = oz_ref[...]
    dx = dx_ref[...]
    dy = dy_ref[...]
    dz = dz_ref[...]
    inv = lambda v: jnp.where(jnp.abs(v) > 1e-12, 1.0 / v, jnp.float32(1e12))
    idx_, idy, idz = inv(dx), inv(dy), inv(dz)

    # Occlusion queries seed best-t with the per-ray max distance: every
    # subtree/triangle beyond the light sample is pruned by the regular
    # best-t tests, which is what makes shadow rays much cheaper than
    # closest-hit rays (the caller tests best_t < t_max afterwards).
    if has_tmax:
        best_t_ref[...] = tm_ref[...]
    else:
        best_t_ref[...] = jnp.full(ox.shape, T_FAR, jnp.float32)
    best_i_ref[...] = jnp.zeros(ox.shape, jnp.int32)

    _FULL = slice(None)

    def _load_box(b, sl: slice = _FULL):
        """Box fields [minx,miny,minz,maxx,maxy,maxz] at flat offset ``b``
        of the node table: plain f32 scalar loads, or bf16-pair decode
        (min in the high half-word rounded down, max in the low half
        rounded up — conservative dilation, see pack_tables_wide).
        Mosaic rejects SCALAR tpu.bitcast (i32->f32), so the bf16 decode
        broadcasts each packed word to the ray-plane shape FIRST and
        bitcasts the vector (caught by the compiled-kernel bench gate;
        interpret mode accepts the scalar form)."""
        if box_enc == "bf16":
            shape = ox[sl].shape
            mn, mx = [], []
            for a in range(3):
                wv = jnp.full(shape, nodes_ref[b + a], jnp.int32)
                mn.append(jax.lax.bitcast_convert_type(
                    wv & jnp.int32(~0xFFFF), jnp.float32))
                mx.append(jax.lax.bitcast_convert_type(wv << 16, jnp.float32))
            return mn + mx
        return [nodes_ref[b + f] for f in range(6)]

    def _hitmask_box(box, sl: slice = _FULL):
        """Per-lane AABB slab test vs a box given as six scalar loads
        (from the SMEM node table or a DMA'd paged-node row), pruned by
        per-ray best t."""
        t1x = (box[0] - ox[sl]) * idx_[sl]
        t2x = (box[3] - ox[sl]) * idx_[sl]
        t1y = (box[1] - oy[sl]) * idy[sl]
        t2y = (box[4] - oy[sl]) * idy[sl]
        t1z = (box[2] - oz[sl]) * idz[sl]
        t2z = (box[5] - oz[sl]) * idz[sl]
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        # >= not >: perfectly FLAT boxes (axis-aligned walls collapse an
        # axis to zero extent) give tmin == tmax for every ray through
        # them — the strict test made whole walls invisible to the BVH
        # paths (caught by a random-ray gate on the courtyard: 41/2048
        # misses, all on wall tris in flat leaves). The +inf empty-slot
        # boxes of the wide kernel stay dead: their tmin = inf fails
        # tmin < best_t.
        hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < best_t_ref[sl])
        return hit, tmin

    def _hitmask_at(b, sl: slice = _FULL):
        return _hitmask_box(_load_box(b, sl), sl)

    def _child_hitmask(node, sl: slice = _FULL):
        return _hitmask_at(node * 6, sl)

    def entry_at(b, sl: slice = _FULL):
        """Packet AABB test vs the box at flat offset ``b`` -> min entry t
        (T_FAR on miss): the single masked-min reduction doubles as the
        any-hit test (entry < T_FAR)."""
        hit, tmin = _hitmask_at(b, sl)
        return jnp.min(jnp.where(hit, tmin, T_FAR))

    def entry_scratch(slot, c, sl: slice = _FULL):
        """Packet entry t vs child ``c``'s box of the PAGED node staged in
        pg_scratch slot ``slot``. Box fields are lane-replicated rows, so
        each read is a (128,) VECTOR that broadcasts against the (R, 128)
        ray planes — no scalar extraction on the box path."""
        box = [pg_scratch[slot, c * 6 + f] for f in range(6)]
        hit, tmin = _hitmask_box(box, sl)
        return jnp.min(jnp.where(hit, tmin, T_FAR))

    def child_entry(node, sl: slice = _FULL):
        return entry_at(node * 6, sl)

    isect = watertight_components if algo == "watertight" else mt_components
    n_rows = ox.shape[0]
    n_groups = row_groups if n_rows % max(row_groups, 1) == 0 else 1
    if arity == 4:
        # row-group leaf masking reads leaf boxes from the BINARY node
        # table, which the wide kernel does not carry
        n_groups = 1
    gr = n_rows // max(n_groups, 1)

    def _dense_rows(slot: int, sl: slice):
        """Dense closest-hit of DMA slot ``slot`` against ray rows ``sl``:
        CH triangles x the row band at once. Triangle fields become
        (CH,1,1) columns (sublane = slot, static lane slice — no one-hot
        extraction, no scalar round trips) broadcast against the (R,128)
        ray planes; per-chunk reduction is an elementwise min-tree over
        the sublane-batch axis, and the winning tri id rides a float min
        with the same mask (ids < 2^24 are exact in f32)."""
        CH = min(8, leaf_size)
        tri = tri_scratch[slot]
        oxs, oys, ozs = ox[sl], oy[sl], oz[sl]
        dxs, dys, dzs = dx[sl], dy[sl], dz[sl]
        for c in range(-(-leaf_size // CH)):
            sub = tri[c * CH:min((c + 1) * CH, leaf_size)]

            def col(j):
                return sub[:, j].reshape(-1, 1, 1)

            ok, t = isect(
                (oxs, oys, ozs), (dxs, dys, dzs),
                (col(0), col(1), col(2)),
                (col(3), col(4), col(5)),
                (col(6), col(7), col(8)),
                EPS,
            )
            t_m = jnp.where(ok, t, T_FAR)
            tmin = jnp.min(t_m, axis=0)     # (rows, 128)
            idm = jnp.min(jnp.where(t_m <= tmin[None], col(9),
                                    jnp.float32(3e7)), axis=0)
            better = tmin < best_t_ref[sl]
            best_i_ref[sl] = jnp.where(better, idm.astype(jnp.int32),
                                       best_i_ref[sl])
            if any_hit:
                # Occlusion-only query: ANY accepted hit terminates the
                # lane — best-t collapses to 0 so every later box test
                # (tmin < best_t with tmin >= 0) fails and the lane stops
                # dilating the packet union. The returned t is then only
                # meaningful as "t < t_max" (the occlusion boolean).
                best_t_ref[sl] = jnp.where(better, jnp.float32(0.0),
                                           best_t_ref[sl])
            else:
                best_t_ref[sl] = jnp.where(better, tmin, best_t_ref[sl])

    def leaf_test_dense(slot: int, leaf_id):
        """Row-group-masked dense leaf test: rays are coherence-sorted, so
        a leaf's potential hitters cluster into a band of sublane rows.
        One slab test against the leaf's own box splits the packet into
        ``row_groups`` bands and the dense chunks run only for bands with
        a potential closer hit — the sub-packet granularity a fully dense
        SIMD test can't express per lane."""
        if n_groups <= 1:
            _dense_rows(slot, slice(0, n_rows))
            return
        b = (ni + leaf_id) * 6
        t1x = (nodes_ref[b + 0] - ox) * idx_
        t2x = (nodes_ref[b + 3] - ox) * idx_
        t1y = (nodes_ref[b + 1] - oy) * idy
        t2y = (nodes_ref[b + 4] - oy) * idy
        t1z = (nodes_ref[b + 2] - oz) * idz
        t2z = (nodes_ref[b + 5] - oz) * idz
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < best_t_ref[...])
        for g in range(n_groups):
            sl = slice(g * gr, (g + 1) * gr)

            @pl.when(jnp.any(hit[sl]))
            def _(sl=sl):
                _dense_rows(slot, sl)

    def _dense_rows_masked(slot: int, row0: int, bits):
        """ROW-MASKED dense leaf test (round-5): the queueing pop saved an
        8-bit active-row mask (which sublane rows had any lane pass the
        leaf box test) into the SMEM bits queue; inactive rows skip their
        dense work entirely. Measured motivation
        (scripts/cfg3m_decompose.py + the offline occupancy sim): dense
        chunks were 73% of 1M-tri traversal time with only ~2.6 of 8
        sublane rows active per leaf visit. Tiles are (CH-tri-sublane x
        128-ray-lane) VREGs per row — same per-op arithmetic as
        _dense_rows, ~1/3 the instances (scripts/rowmask_patterns_probe.py
        proved the row-store / tri-sublane-tile / rowbits Mosaic patterns
        on this toolchain)."""
        CH = min(8, leaf_size)
        tri = tri_scratch[slot]
        # hoist the (CH,1) column extractions out of the row loop: 10
        # lane-slices per chunk happen ONCE per leaf visit, not once per
        # active row (the first cut paid 8x the extractions)
        n_chunks = -(-leaf_size // CH)
        cols = []
        for c in range(n_chunks):
            sub = tri[c * CH:min((c + 1) * CH, leaf_size)]
            cols.append([sub[:, j].reshape(-1, 1) for j in range(10)])
        for r in range(rows_pp):
            @pl.when(((bits >> r) & 1) > 0)
            def _(r=r):
                oxr, oyr, ozr = ox[row0 + r], oy[row0 + r], oz[row0 + r]
                dxr, dyr, dzr = dx[row0 + r], dy[row0 + r], dz[row0 + r]
                for c in range(n_chunks):
                    col = cols[c].__getitem__
                    ok, t = isect(
                        (oxr, oyr, ozr), (dxr, dyr, dzr),
                        (col(0), col(1), col(2)),
                        (col(3), col(4), col(5)),
                        (col(6), col(7), col(8)),
                        EPS,
                    )                                  # (CH, 128)
                    t_m = jnp.where(ok, t, T_FAR)
                    tmin = jnp.min(t_m, axis=0)        # (128,)
                    idm = jnp.min(jnp.where(t_m <= tmin[None], col(9),
                                            jnp.float32(3e7)), axis=0)
                    better = tmin < best_t_ref[row0 + r]
                    best_i_ref[row0 + r] = jnp.where(
                        better, idm.astype(jnp.int32), best_i_ref[row0 + r])
                    if any_hit:
                        best_t_ref[row0 + r] = jnp.where(
                            better, jnp.float32(0.0), best_t_ref[row0 + r])
                    else:
                        best_t_ref[row0 + r] = jnp.where(
                            better, tmin, best_t_ref[row0 + r])

    def leaf_dma(slot: int, leaf_id):
        return pltpu.make_async_copy(
            tris_ref.at[pl.ds(leaf_id * leaf_size, leaf_size)],
            tri_scratch.at[slot], dma_sem.at[slot],
        )

    if push_mode == "axis":
        # packet-mean direction signs (3 reductions per packet, amortized)
        dsign = [(jnp.sum(dx) > 0).astype(jnp.int32),
                 (jnp.sum(dy) > 0).astype(jnp.int32),
                 (jnp.sum(dz) > 0).astype(jnp.int32)]

    def run(stack_ref, queue_ref):
        def _pop_head(state):
            sp, qn, steps = state
            sp = sp - 1
            node = stack_ref[sp]
            is_leaf = node >= ni

            @pl.when(is_leaf)
            def _():
                queue_ref[qn] = node - ni

            qn = qn + is_leaf.astype(jnp.int32)
            safe_node = jnp.where(is_leaf, 0, node)
            return sp, qn, node, is_leaf, safe_node

        def _push2(sp, second, push_second, first, push_first):
            @pl.when(push_second)
            def _():
                stack_ref[sp] = second

            sp = sp + push_second.astype(jnp.int32)

            @pl.when(push_first)
            def _():
                stack_ref[sp] = first

            return sp + push_first.astype(jnp.int32)

        def fill_body(state):
            """One stack pop: leaves are queued (no DMA yet), internal
            nodes AABB-test both children and push hits far-first (exact
            per-packet entry ordering: 2 masked-min reductions)."""
            sp, qn, node, is_leaf, safe_node = _pop_head(state)
            l = links_ref[2 * safe_node] & LINK_MASK
            r = links_ref[2 * safe_node + 1]
            lentry = child_entry(l)
            rentry = child_entry(r)
            near_first = lentry <= rentry
            first = jnp.where(near_first, l, r)
            second = jnp.where(near_first, r, l)
            push2 = (~is_leaf) & (jnp.maximum(lentry, rentry) < T_FAR)
            push1 = (~is_leaf) & (jnp.minimum(lentry, rentry) < T_FAR)
            sp = _push2(sp, second, push2, first, push1)
            return sp, qn, state[2] + 1

        def fill_body_axis(state):
            """Pop variant with ONE cross-lane reduction: both children's
            per-lane hit masks fold into a single integer sum
            (hitL*2^16 + hitR summed over <=1024 lanes stays below 2^31),
            and near-first ordering comes from the node's packed split
            axis + the packet-mean direction sign instead of entry t."""
            sp, qn, node, is_leaf, safe_node = _pop_head(state)
            lp = links_ref[2 * safe_node]
            r = links_ref[2 * safe_node + 1]
            l = lp & LINK_MASK
            axis = (lp >> 28) & 3
            swap = (lp >> 30) & 1
            hitl, _ = _child_hitmask(l)
            hitr, _ = _child_hitmask(r)
            ssum = jnp.sum(hitl.astype(jnp.int32) * 65536
                           + hitr.astype(jnp.int32))
            anyl = ssum >= 65536
            anyr = (ssum & 65535) > 0
            dpa = jnp.where(axis == 0, dsign[0],
                            jnp.where(axis == 1, dsign[1], dsign[2]))
            near_is_l = dpa != swap
            first = jnp.where(near_is_l, l, r)
            any_first = jnp.where(near_is_l, anyl, anyr)
            second = jnp.where(near_is_l, r, l)
            any_second = jnp.where(near_is_l, anyr, anyl)
            # when only one child hit, push it as "first" regardless of order
            first = jnp.where(any_first, first, second)
            push2 = (~is_leaf) & any_first & any_second
            push1 = (~is_leaf) & (any_first | any_second)
            sp = _push2(sp, second, push2, first, push1)
            return sp, qn, state[2] + 1

        if push_mode == "axis":
            fill_body = fill_body_axis

        cap = jnp.int32(8 * (ni + num_leaves) + 64)

        def fill_cond(state):
            sp, qn, steps = state
            return (sp > 0) & (qn < nq) & (steps < cap)

        def round_body(state):
            sp, _, steps = state
            sp, qn, steps = jax.lax.while_loop(fill_cond, fill_body,
                                               (sp, jnp.int32(0), steps))
            # Issue EVERY queued leaf's DMA before waiting on any — nq
            # copies in flight; unqueued slots re-copy leaf 0 (DMA start/
            # wait must stay unpredicated on this toolchain — only the
            # dense test is masked), and a final partial round pays one
            # dummy row slab, not one per pop like round 1. (A ping-pong
            # two-group variant that also overlapped copies with the NEXT
            # fill phase measured a wash: 21.8/2.11 vs 23.1/2.08 Mrays/s —
            # the in-flight queue + per-slot test overlap already hides
            # the latency, so the extra structure was removed.)
            qids = []
            for j in range(nq):
                qj = jnp.where(j < qn, queue_ref[j], 0)
                qids.append(qj)
                leaf_dma(j, qj).start()
            for j in range(nq):
                leaf_dma(j, qids[j]).wait()

                @pl.when(j < qn)
                def _(j=j):
                    leaf_test_dense(j, qids[j])

            return sp, jnp.int32(0), steps

        if ni == 0:
            leaf_dma(0, jnp.int32(0)).start()
            leaf_dma(0, jnp.int32(0)).wait()
            _dense_rows(0, slice(0, n_rows))
            if steps_ref is not None:
                steps_ref[...] = jnp.ones_like(best_i_ref[...])
        else:
            if has_starts:
                stack_ref[0] = starts_ref[_start_base]
            else:
                stack_ref[0] = jnp.int32(0)
            _, _, steps = jax.lax.while_loop(
                lambda state: (state[0] > 0) & (state[2] < cap),
                round_body,
                (jnp.int32(1), jnp.int32(0), jnp.int32(0)),
            )
            if steps_ref is not None:
                steps_ref[...] = jnp.full_like(best_i_ref[...], steps)

    def run_multi(stack_ref, queue_ref, pqueue_ref=None, bits_ref=None):
        """``ways`` independent packets of ``rows_pp``x128 rays traverse in
        lockstep inside one grid step (rays (rows_pp*ways,128): rows
        w*rows_pp..(w+1)*rows_pp-1 = packet w). Each loop iteration pops one
        node per packet and traces ALL child slab tests BEFORE any of the
        reductions is consumed, so one packet's reduction/scalar latency
        (the dominant pop cost) overlaps the other packets' vector work.

        Narrow packets (rows_pp < 8) attack packet-union dilation on
        incoherent rays: a packet visits the union of its members' node
        sets, and every visited leaf pays a dense test over the whole
        packet — both shrink with the packet, while extra scalar pops hide
        under the other packets' vector work."""
        HS = [slice(w * rows_pp, (w + 1) * rows_pp) for w in range(ways)]

        def push2_h(h, sp, second, push_second, first, push_first):
            @pl.when(push_second)
            def _():
                stack_ref[h, sp] = second

            sp = sp + push_second.astype(jnp.int32)

            @pl.when(push_first)
            def _():
                stack_ref[h, sp] = first

            return sp + push_first.astype(jnp.int32)

        def pop_half(h, sp, qn):
            """Pop for packet h: leaves queue; internals return their child
            links (2 or 4) plus the safe parent id (wide boxes live at the
            PARENT's table row). Under ``row_mask`` the pop needs room for
            up to 4 direct-queued leaf children (fill_pair queues leaf
            children at the parent pop, skipping their stack round-trip);
            stack-popped leaves still occur (paged drain pushes leaf
            children) and get a FULL row mask."""
            if row_mask:
                do = (sp > 0) & (qn + 4 <= nq)
            else:
                do = (sp > 0) & (qn < nq)
            spc = jnp.maximum(sp - 1, 0)
            node = stack_ref[h, spc]
            is_leaf = (node >= ni) & do

            @pl.when(is_leaf)
            def _():
                queue_ref[h * nq + qn] = node - ni
                if row_mask:
                    bits_ref[h * nq + qn] = jnp.int32((1 << rows_pp) - 1)

            qn = qn + is_leaf.astype(jnp.int32)
            safe = jnp.where(node >= ni, 0, node)
            if arity == 2:
                links = (links_ref[2 * safe] & LINK_MASK, links_ref[2 * safe + 1])
            else:
                links = tuple(links_ref[4 * safe + c] for c in range(4))
            return do, spc, node >= ni, links, safe, qn

        def pop_half_paged(h, sp, qn, pqn):
            """Paged pop: triangle leaves go to the leaf queue, NON-RESIDENT
            wide nodes (id >= s_resident) go to the paged-node queue (their
            HBM row is DMA'd and expanded in the drain phase — a round-trip
            through the queue instead of an immediate SMEM expansion), and
            resident nodes expand inline as usual."""
            if row_mask:
                do = (sp > 0) & (qn + 4 <= nq) & (pqn < npq)
            else:
                do = (sp > 0) & (qn < nq) & (pqn < npq)
            spc = jnp.maximum(sp - 1, 0)
            node = stack_ref[h, spc]
            is_leaf = (node >= ni) & do
            is_pg = do & (node < ni) & (node >= s_resident)

            @pl.when(is_leaf)
            def _():
                queue_ref[h * nq + qn] = node - ni
                if row_mask:
                    bits_ref[h * nq + qn] = jnp.int32((1 << rows_pp) - 1)

            @pl.when(is_pg)
            def _():
                pqueue_ref[h * npq + pqn] = node - s_resident

            qn = qn + is_leaf.astype(jnp.int32)
            pqn = pqn + is_pg.astype(jnp.int32)
            resident = node < s_resident
            safe = jnp.where(resident, node, 0)
            links = tuple(links_ref[4 * safe + c] for c in range(4))
            # "node_leaf" for decide_push4's gate: anything NOT expanded
            # inline (triangle leaf or paged node)
            return do, spc, ~resident, links, safe, qn, pqn

        def decide_push(h, do, spc, node_leaf, links, le, re, sp_old):
            l, r = links
            near_first = le <= re
            first = jnp.where(near_first, l, r)
            second = jnp.where(near_first, r, l)
            gate = do & (~node_leaf)
            push2 = gate & (jnp.maximum(le, re) < T_FAR)
            push1 = gate & (jnp.minimum(le, re) < T_FAR)
            sp_new = push2_h(h, spc, second, push2, first, push1)
            return jnp.where(do, sp_new, sp_old)

        def _expand4_rowmask(pops, sps, cs):
            """row_mask expansion shared by the resident and paged fill
            loops. Per child: ONE cross-lane (axis=1) min reduction gives
            the per-ROW entry minima (8,1); the packet entry scalar and an
            8-bit active-row mask derive from it with tiny sublane
            reductions — same big-reduction count as the plain path. Leaf
            children DIRECT-QUEUE (no stack round-trip) with their row
            bits in the SMEM bits queue; internal hit children push
            entry-ordered. (A first cut stored full (8,128) mask PLANES in
            VMEM instead: 16 live planes + predicated VMEM stores made the
            fill iteration ~1.8x more expensive and lost the whole gain —
            mega 15.5 -> 13.3 Mrays/s, measured r5.) Returns
            (new_sps, new_qns)."""
            riota = jax.lax.broadcasted_iota(jnp.int32, (rows_pp, 1), 0)
            # entry scalars exactly as the plain path (ONE full-min
            # reduction per child, all traced before any consumer). An
            # eager per-child rowmin restructure was measured 10ms slower
            # per 1M-ray launch (mega "fill" 76.8 vs "off" 66.9 ms):
            # rowbits instead compute LAZILY inside the queue branch below
            # — only the ~10% of child tests that actually queue a leaf
            # pay the slab recompute + small reductions.
            ents = [
                [entry_at(4 * cs * p[4] + cs * c, HS[w]) for c in range(4)]
                for w, p in enumerate(pops)
            ]
            new_sps, new_qns = [], []
            for w, p in enumerate(pops):
                do, spc, not_inline = p[0], p[1], p[2]
                qn = p[5]
                push_ents = []
                for c in range(4):
                    lk = p[3][c]
                    leafc = lk >= ni
                    e = ents[w][c]
                    q = do & (~not_inline) & leafc & (e < T_FAR)

                    @pl.when(q)
                    def _(w=w, c=c, qn=qn, lk=lk, p=p):
                        hm, tm = _hitmask_at(4 * cs * p[4] + cs * c, HS[w])
                        rowmin = jnp.min(jnp.where(hm, tm, T_FAR), axis=1,
                                         keepdims=True)    # (rows_pp, 1)
                        bits = jnp.sum(
                            (rowmin < T_FAR).astype(jnp.int32) << riota)
                        queue_ref[w * nq + qn] = lk - ni
                        bits_ref[w * nq + qn] = bits

                    qn = qn + q.astype(jnp.int32)
                    push_ents.append(jnp.where(leafc, T_FAR, e))
                new_sps.append(decide_push4(w, do, spc, not_inline, p[3],
                                            tuple(push_ents), sps[w]))
                new_qns.append(qn)
            return tuple(new_sps), tuple(new_qns)

        def decide_push4(h, do, spc, node_leaf, links, ents, sp_old):
            """Entry-ordered push of up to 4 hit children: a 5-exchange
            sorting network orders (entry, link) pairs ascending, children
            push far-first so the nearest subtree pops first and best-t
            prunes the rest (the same property the binary path has)."""
            e = list(ents)
            l = list(links)
            for i, j in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
                sw = e[j] < e[i]
                e[i], e[j] = jnp.where(sw, e[j], e[i]), jnp.where(sw, e[i], e[j])
                l[i], l[j] = jnp.where(sw, l[j], l[i]), jnp.where(sw, l[i], l[j])
            gate = do & (~node_leaf)
            sp = spc
            for k in (3, 2, 1, 0):  # far first; nearest ends on top
                p = gate & (e[k] < T_FAR)

                @pl.when(p)
                def _(sp=sp, k=k):
                    stack_ref[h, sp] = l[k]

                sp = sp + p.astype(jnp.int32)
            return jnp.where(do, sp, sp_old)

        capm = jnp.int32(8 * ways * (ni + num_leaves) + 64 * ways)

        def paged_dma(slot, p):
            """Copy paged node ``p``'s PAGED_NODE_ROWS(=28)-row block into
            VMEM scratch slot ``slot`` (the proven in-loop HBM->VMEM
            leaf-DMA pattern)."""
            return pltpu.make_async_copy(
                prows_ref.at[pl.ds(p * PAGED_NODE_ROWS, PAGED_NODE_ROWS)],
                pg_scratch.at[slot],
                pg_sem.at[slot],
            )

        def fill_pair_paged(state):
            sps = state[:ways]
            qns = state[ways:2 * ways]
            pqns = state[2 * ways:3 * ways]
            steps = state[-1]
            pops = [pop_half_paged(w, sps[w], qns[w], pqns[w])
                    for w in range(ways)]
            cnt = ()
            if count_steps:
                c = state[3 * ways]
                for p in pops:
                    c = c + p[0].astype(jnp.int32)
                cnt = (c,)
            cs = 3 if box_enc == "bf16" else 6  # resident words per child box
            if row_mask:
                new_sps, new_qns = _expand4_rowmask(pops, sps, cs)
                return (new_sps + new_qns
                        + tuple(p[6] for p in pops) + cnt + (steps + 1,))
            ents = [
                tuple(entry_at(4 * cs * p[4] + cs * c, HS[w]) for c in range(4))
                for w, p in enumerate(pops)
            ]
            new_sps = tuple(
                decide_push4(w, pops[w][0], pops[w][1], pops[w][2],
                             pops[w][3], ents[w], sps[w])
                for w in range(ways)
            )
            return (new_sps + tuple(p[5] for p in pops)
                    + tuple(p[6] for p in pops) + cnt + (steps + 1,))

        def fill_cond_paged(state):
            sps = state[:ways]
            qns = state[ways:2 * ways]
            pqns = state[2 * ways:3 * ways]
            room = (nq - 4) if row_mask else (nq - 1)
            any_do = (sps[0] > 0) & (qns[0] <= room) & (pqns[0] < npq)
            for w in range(1, ways):
                any_do = any_do | (
                    (sps[w] > 0) & (qns[w] <= room) & (pqns[w] < npq)
                )
            return any_do & (state[-1] < capm)

        def round_body_paged(state):
            """One paged round: fill (resident expansion + queueing), then
            start ALL paged-node and leaf DMAs back-to-back, then expand
            the staged paged nodes (their children go back on the stack —
            the scalar expansion work overlaps the leaf DMAs still in
            flight), then dense-test the staged leaves."""
            sps, steps = list(state[:ways]), state[-1]
            zero = tuple(jnp.int32(0) for _ in range(2 * ways))
            cnt0 = (state[ways],) if count_steps else ()
            st = jax.lax.while_loop(fill_cond_paged, fill_pair_paged,
                                    tuple(sps) + zero + cnt0 + (steps,))
            sps = list(st[:ways])
            qns = st[ways:2 * ways]
            pqns = st[2 * ways:3 * ways]
            steps = st[-1]
            cnt_out = ()
            if count_steps:
                lv, pv = state[ways + 1], state[ways + 2]
                for q in qns:
                    lv = lv + q
                for q in pqns:
                    pv = pv + q
                cnt_out = (st[3 * ways], lv, pv)
            pids = []
            for j in range(ways * npq):
                h, jj = divmod(j, npq)
                pj = jnp.where(jj < pqns[h], pqueue_ref[j], 0)
                pids.append(pj)
                paged_dma(j, pj).start()
            qids = []
            for j in range(ways * nq):
                h, jj = divmod(j, nq)
                qj = jnp.where(jj < qns[h], queue_ref[j], 0)
                qids.append(qj)
                leaf_dma(j, qj).start()
            for j in range(ways * npq):
                paged_dma(j, pids[j]).wait()
            # all slots' vector slab tests trace before any push consumes a
            # reduction (the fill loop's latency-hiding pattern)
            all_ents = [
                tuple(entry_scratch(j, c, HS[j // npq]) for c in range(4))
                for j in range(ways * npq)
            ]
            all_lks = [
                tuple(jnp.min(pg_scratch[j, 24 + c]).astype(jnp.int32)
                      for c in range(4))
                for j in range(ways * npq)
            ]
            for j in range(ways * npq):
                h, jj = divmod(j, npq)
                pvalid = jj < pqns[h]
                sps[h] = decide_push4(h, pvalid, sps[h], jnp.bool_(False),
                                      all_lks[j], all_ents[j], sps[h])
            for j in range(ways * nq):
                h, jj = divmod(j, nq)
                leaf_dma(j, qids[j]).wait()

                @pl.when(jj < qns[h])
                def _(j=j, h=h):
                    if row_mask and row_mask != "fill":
                        _dense_rows_masked(j, h * rows_pp, bits_ref[j])
                    else:
                        _dense_rows(j, HS[h])

            return tuple(sps) + cnt_out + (steps,)

        def fill_pair(state):
            sps, qns, steps = state[:ways], state[ways:2 * ways], state[-1]
            cnt = (state[2 * ways],) if count_steps else ()
            # ``pops_per_iter`` > 1 amortizes the while-loop iteration
            # overhead (the ~300-cycle scalar-control class measured via
            # the row-mask experiments) over several sequential pops per
            # way; each rep's pushes feed the next rep's pop.
            for _rep in range(max(pops_per_iter, 1)):
                pops = [pop_half(w, sps[w], qns[w]) for w in range(ways)]
                # do-gated pop counter (decomposition instrumentation):
                # fill ITERATIONS (lockstep) vs useful POPS (sum over
                # ways) — their ratio is the interleave utilization.
                if count_steps:
                    c = cnt[0]
                    for p in pops:
                        c = c + p[0].astype(jnp.int32)
                    cnt = (c,)
                # all vector tests traced before any reduction consumer
                if arity == 2:
                    els = [child_entry(p[3][0], HS[w])
                           for w, p in enumerate(pops)]
                    ers = [child_entry(p[3][1], HS[w])
                           for w, p in enumerate(pops)]
                    sps = tuple(
                        decide_push(w, pops[w][0], pops[w][1], pops[w][2],
                                    pops[w][3], els[w], ers[w], sps[w])
                        for w in range(ways)
                    )
                    qns = tuple(p[5] for p in pops)
                elif row_mask:
                    cs = 3 if box_enc == "bf16" else 6
                    sps, qns = _expand4_rowmask(pops, sps, cs)
                else:
                    cs = 3 if box_enc == "bf16" else 6  # words per child box
                    ents = [
                        tuple(entry_at(4 * cs * p[4] + cs * c, HS[w])
                              for c in range(4))
                        for w, p in enumerate(pops)
                    ]
                    sps = tuple(
                        decide_push4(w, pops[w][0], pops[w][1], pops[w][2],
                                     pops[w][3], ents[w], sps[w])
                        for w in range(ways)
                    )
                    qns = tuple(p[5] for p in pops)
            return tuple(sps) + tuple(qns) + cnt + (steps + 1,)

        def fill_cond(state):
            sps, qns, steps = state[:ways], state[ways:2 * ways], state[-1]
            room = (nq - 4) if row_mask else (nq - 1)
            any_do = (sps[0] > 0) & (qns[0] <= room)
            for w in range(1, ways):
                any_do = any_do | ((sps[w] > 0) & (qns[w] <= room))
            return any_do & (steps < capm)

        def round_body(state):
            sps, steps = state[:ways], state[-1]
            zero = tuple(jnp.int32(0) for _ in range(ways))
            cnt0 = (state[ways],) if count_steps else ()
            st = jax.lax.while_loop(fill_cond, fill_pair,
                                    tuple(sps) + zero + cnt0 + (steps,))
            sps, qns, steps = st[:ways], st[ways:2 * ways], st[-1]
            cnt_out = ()
            if count_steps:
                lv = state[ways + 1]
                for q in qns:
                    lv = lv + q
                cnt_out = (st[2 * ways], lv)
            qids = []
            for j in range(ways * nq):
                h, jj = divmod(j, nq)
                qj = jnp.where(jj < qns[h], queue_ref[j], 0)
                qids.append(qj)
                leaf_dma(j, qj).start()
            for j in range(ways * nq):
                h, jj = divmod(j, nq)
                leaf_dma(j, qids[j]).wait()

                @pl.when(jj < qns[h])
                def _(j=j, h=h):
                    if row_mask and row_mask != "fill":
                        _dense_rows_masked(j, h * rows_pp, bits_ref[j])
                    else:
                        _dense_rows(j, HS[h])

            return tuple(sps) + cnt_out + (steps,)

        for w in range(ways):
            if has_starts:
                stack_ref[w, 0] = starts_ref[_start_base + w]
            else:
                stack_ref[w, 0] = jnp.int32(0)

        def outer_cond(st):
            alive = st[0] > 0
            for w in range(1, ways):
                alive = alive | (st[w] > 0)
            return alive & (st[-1] < capm)

        # counters (count_steps only): pops, leaf visits[, paged visits]
        n_cnt = (3 if paged else 2) if count_steps else 0
        st = jax.lax.while_loop(
            outer_cond, round_body_paged if paged else round_body,
            tuple(jnp.int32(1) for _ in range(ways))
            + tuple(jnp.int32(0) for _ in range(n_cnt))
            + (jnp.int32(0),),
        )
        if steps_ref is not None:
            if count_steps and n_cnt:
                # lane-packed decomposition counters (see count_decode):
                # lanes [0,32) fill iterations, [32,64) useful pops,
                # [64,96) leaf visits, [96,128) paged-node visits
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, best_i_ref.shape, 1)
                popsv = st[ways]
                leavesv = st[ways + 1]
                pgv = st[ways + 2] if paged else jnp.int32(0)
                steps_ref[...] = jnp.where(
                    lane < 32, st[-1],
                    jnp.where(lane < 64, popsv,
                              jnp.where(lane < 96, leavesv, pgv)))
            else:
                steps_ref[...] = jnp.full_like(best_i_ref[...], st[-1])

    if (ways > 1 or arity == 4) and ni > 0:
        scr = [pltpu.SMEM((max(ways, 1), STACK_DEPTH), jnp.int32),
               pltpu.SMEM((max(ways, 1) * nq,), jnp.int32)]
        if paged:
            scr.append(pltpu.SMEM((max(ways, 1) * npq,), jnp.int32))
        if row_mask:
            scr.append(pltpu.SMEM((max(ways, 1) * nq,), jnp.int32))  # bits
        if row_mask and not paged:
            pl.run_scoped(lambda st, q, b: run_multi(st, q, None, b), *scr)
        else:
            pl.run_scoped(run_multi, *scr)  # (st, q[, pq][, bits]) in order
    else:
        pl.run_scoped(run, pltpu.SMEM((STACK_DEPTH,), jnp.int32),
                      pltpu.SMEM((max(nq, 2),), jnp.int32))


def pack_tables(bvh, tri_a, tri_b, tri_c):
    """Pack the tree for the kernel (once per (scene, bvh)).

    Returns (nodes, links, tris):
      nodes : (Nn*6,) f32 flat SMEM box table —
              node n's minx,miny,minz,maxx,maxy,maxz at [6n, 6n+6)
      links : (max(ni,1)*2,) i32 flat SMEM child table
      tris  : (C*L, 128) f32 HBM rows, one per leaf slot; lane 0-8 hold
              the corner coordinates, lane 9 the float-encoded tri id.
    """
    ni = bvh.num_internal
    nodes = jnp.concatenate([bvh.node_min, bvh.node_max], axis=1).reshape(-1)
    if ni > 0:
        # split axis + child order along it, packed into the left link's
        # high bits (consumed by the push_mode="axis" traversal ordering)
        c_l = 0.5 * (bvh.node_min[bvh.node_left] + bvh.node_max[bvh.node_left])
        c_r = 0.5 * (bvh.node_min[bvh.node_right] + bvh.node_max[bvh.node_right])
        sep = jnp.abs(c_l - c_r)
        axis = jnp.argmax(sep, axis=1).astype(jnp.int32)
        swap = (jnp.take_along_axis(c_l, axis[:, None], 1)
                > jnp.take_along_axis(c_r, axis[:, None], 1))[:, 0]
        left_packed = bvh.node_left | (axis << 28) | (swap.astype(jnp.int32) << 30)
        links = jnp.stack([left_packed, bvh.node_right], axis=1).reshape(-1)
    else:
        links = jnp.zeros((2,), jnp.int32)

    return nodes, links, _pack_tris(bvh, tri_a, tri_b, tri_c)


def _pack_tris(bvh, tri_a, tri_b, tri_c):
    # Triangle ids ride f32 through the kernel's min-reduction: exact only
    # below 2^24. Paged mode has no scene-size cliff, so guard loudly here
    # instead of returning silently corrupted hit ids on giant scenes.
    assert tri_a.shape[0] < (1 << 24), (
        f"{tri_a.shape[0]} tris exceed f32-exact hit ids (2^24)")
    leaf_flat = bvh.leaf_tri.reshape(-1)
    a = tri_a[leaf_flat]
    b = tri_b[leaf_flat]
    c = tri_c[leaf_flat]
    corners = jnp.concatenate([a, b, c], axis=1)  # (C*L, 9)
    slots = corners.shape[0]
    tris = jnp.zeros((slots, TRI_FIELDS), jnp.float32)
    tris = tris.at[:, :9].set(corners)
    tris = tris.at[:, 9].set(leaf_flat.astype(jnp.float32))
    return tris


def _bf16_down_bits(x):
    """Bit pattern of the largest bf16 <= x (round toward -inf). IEEE754 is
    sign-magnitude: mantissa truncation rounds toward ZERO, so negative
    values with dropped bits step one bf16 ulp away from zero."""
    b = jax.lax.bitcast_convert_type(x, jnp.int32)
    low = b & 0xFFFF
    trunc = b & jnp.int32(~0xFFFF)
    return jnp.where((x < 0) & (low != 0), trunc + 0x10000, trunc)


def _bf16_up_bits(x):
    b = jax.lax.bitcast_convert_type(x, jnp.int32)
    low = b & 0xFFFF
    trunc = b & jnp.int32(~0xFFFF)
    return jnp.where((x > 0) & (low != 0), trunc + 0x10000, trunc)


# Paged mode: wide nodes [0, S) stay SMEM-resident (f32 layout), nodes
# [S, W) live as LANE-REPLICATED HBM row blocks and are DMA'd into VMEM
# scratch through a per-way queue when popped — a round-trip through the
# queue instead of an immediate SMEM expansion. This removes the SMEM size
# cliff: any scene traverses the Pallas kernel at any leaf size.
#
# Why VMEM and why replicated: HBM->SMEM DMA works on this toolchain ONLY
# outside loop bodies (scripts/smem_dma_probe.py: standalone copies run,
# the same copy inside a lax.while_loop hangs the Mosaic compiler — the
# known in-loop-DMA pitfall extends to SMEM destinations; the HBM->VMEM
# leaf-DMA pattern inside the round loop is proven). A VMEM box field read
# as a SCALAR costs a ~65-cycle one-hot extraction (the round-1 lesson
# that moved boxes to SMEM), so each paged box field is stored as one
# 128-lane REPLICATED row: the slab test consumes `scratch[j, field]` as a
# (128,) vector broadcast against the (R, 128) ray planes — zero scalar
# extractions for boxes. Only the 4 child links (row 24, lanes 0-3) pay
# the extraction, once per paged visit. (Round-4 probe update: a STATIC
# scalar element read from VMEM scratch also fails to compile here —
# scripts/paged_patterns_probe.py probe2 — so the links are replicated
# rows too, extracted by a min-reduction, which probe3/4 prove out.)
PAGED_QUEUE = 4
PAGED_NODE_ROWS = 28          # 24 replicated box-field rows + 4 link rows
# Resident budget below SMEM_NODE_BUDGET: leaves room for the queues and
# stacks on top of the resident table.
PAGED_SMEM_BUDGET = 640 << 10
PAGED_NODE_BYTES = 24 * 4 + 4 * 4  # f32 wide boxes + links (resident)


def paged_resident(num_wide: int) -> int:
    """Resident wide-node count S for the paged kernel."""
    return max(1, min(num_wide, PAGED_SMEM_BUDGET // PAGED_NODE_BYTES))


def _wide_boxes_links(bvh):
    """(W, 4, 6) child boxes (empty slots = +inf point boxes) and (W, 4)
    links of the BVH4 overlay, gathered from the live binary boxes."""
    boxes = jnp.concatenate([bvh.node_min, bvh.node_max], axis=1)
    src = bvh.wide_src
    g = boxes[jnp.maximum(src, 0)]
    empty = jnp.full((6,), np.inf, jnp.float32)
    g = jnp.where((src < 0)[..., None], empty, g)
    links = jnp.maximum(bvh.wide_child, 0)
    return g, links


def pack_tables_paged(bvh, tri_a, tri_b, tri_c, resident_cap: int | None = None,
                      resident_enc: str = "bf16"):
    """Pack for the paged kernel: (nodes4_resident, links4_resident, tris,
    paged_rows). ``resident_cap`` overrides S (tests force heavy paging
    with tiny caps).

    ``resident_enc``: the RESIDENT table's box encoding. "bf16"
    (conservatively-dilated packed boxes, the pack_tables_wide scheme)
    doubles the resident node count per SMEM byte — measured the dominant
    paged-mode lever, because wide-node visit frequency decays
    geometrically with depth: at 1M tris / leaf 48 it lifts residency
    from 35% to 62% of the wide tree and cuts paged DMA traffic to the
    cold bottom levels.

    paged_rows: ((W-S) * PAGED_NODE_ROWS, 128) f32 — paged node p's block
    at rows [p*28, p*28+28): row c*6+f = child c's box field f REPLICATED
    across all 128 lanes (vector-broadcast consumption, see module note),
    rows 24-27 = the float-encoded child links (< 2^24, exact), also
    lane-replicated (scalar-extracted by min-reduction; see module note)."""
    g, links = _wide_boxes_links(bvh)
    W = bvh.num_wide
    per_node = 12 * 4 + 4 * 4 if resident_enc == "bf16" else PAGED_NODE_BYTES
    if resident_cap is None:
        S = max(1, min(W, PAGED_SMEM_BUDGET // per_node))
    else:
        S = max(1, min(W, resident_cap))
    assert W + bvh.num_leaves < (1 << 24), "paged links exceed f32-exact ids"
    if resident_enc == "bf16":
        mn = _bf16_down_bits(g[:S, :, 0:3])
        mx = _bf16_up_bits(g[:S, :, 3:6])
        nodes4 = ((mn & jnp.int32(~0xFFFF)) | ((mx >> 16) & 0xFFFF)).reshape(-1)
    else:
        nodes4 = g[:S].reshape(-1)
    links4 = links[:S].reshape(-1)
    n_paged = max(W - S, 1)
    blocks = jnp.zeros((n_paged, PAGED_NODE_ROWS, 128), jnp.float32)
    if W > S:
        boxes = g[S:].reshape(W - S, 24, 1)  # replicate each field row-wide
        blocks = blocks.at[: W - S, :24, :].set(
            jnp.broadcast_to(boxes, (W - S, 24, 128))
        )
        lk = links[S:].astype(jnp.float32).reshape(W - S, 4, 1)
        blocks = blocks.at[: W - S, 24:28, :].set(
            jnp.broadcast_to(lk, (W - S, 4, 128))
        )
    rows = blocks.reshape(n_paged * PAGED_NODE_ROWS, 128)
    return nodes4, links4, _pack_tris(bvh, tri_a, tri_b, tri_c), rows


def pack_tables_wide(bvh, tri_a, tri_b, tri_c, box_enc: str = "f32"):
    """Pack the BVH4 overlay for the wide kernel.

    Returns (nodes4, links4, tris):
      nodes4 : box_enc="f32": (W*24,) f32 flat SMEM table — wide node w's
               child c box (minx..maxz) at [w*24 + c*6, +6).
               box_enc="bf16": (W*12,) i32 — per axis ONE word packing
               min (high 16, rounded toward -inf) and max (low 16, rounded
               toward +inf): conservatively DILATED boxes (<=0.8% per side),
               exact traversal results, half the SMEM (TerraBVH.h:12-22 made
               the same node-bytes trade at 64B; this is ours at 64B/4-wide).
      links4 : (W*4,) i32 child table (wide id, or W + leaf_id)
      tris   : as in pack_tables (shared leaf layout)

    Child boxes are gathered from the LIVE binary node boxes through
    ``wide_src``, so a refit (edit.py vertex moves) updates the wide view
    with no topology rebuild."""
    boxes = jnp.concatenate([bvh.node_min, bvh.node_max], axis=1)  # (2L-1, 6)
    src = bvh.wide_src  # (W, 4)
    g = boxes[jnp.maximum(src, 0)]  # (W, 4, 6)
    # Empty slot = a DEGENERATE point box at +inf: both slab values per
    # axis are the same signed inf, so the strict entry test
    # (tmax > max(tmin, 0)) can never pass — for ANY direction sign.
    # (An "inverted" min>max box is NOT safe: a negative direction
    # component swaps the slabs back. A FINITE point box, e.g. 3e38, is
    # NOT safe under bf16 packing: min-rounds-down/max-rounds-up dilates
    # it into a real box whose tmin ~ 3e38 < T_FAR — it "hits" and pushes
    # its clamped link 0, corrupting traversal. inf is exact in bf16:
    # 0x7F800000 survives both roundings. Caught by the compiled-kernel
    # bench gate on the 242k courtyard: 41/2048 wrong hits.)
    empty = jnp.full((6,), np.inf, jnp.float32)
    g = jnp.where((src < 0)[..., None], empty, g)
    links4 = jnp.maximum(bvh.wide_child, 0).reshape(-1)
    if box_enc == "bf16":
        mn = _bf16_down_bits(g[..., 0:3])            # (W, 4, 3) i32
        mx = _bf16_up_bits(g[..., 3:6])
        words = (mn & jnp.int32(~0xFFFF)) | ((mx >> 16) & 0xFFFF)
        return words.reshape(-1), links4, _pack_tris(bvh, tri_a, tri_b, tri_c)
    nodes4 = g.reshape(-1)
    return nodes4, links4, _pack_tris(bvh, tri_a, tri_b, tri_c)


def _binary_bytes(bvh) -> int:
    nn = 2 * bvh.num_leaves - 1 if bvh.num_leaves else 1
    return nn * 6 * 4 + max(bvh.num_internal, 1) * 2 * 4


def wide_mode(bvh):
    """Box encoding the kernel will traverse, by measured preference
    (242k-tri courtyard, incoherent Mrays/s): full-precision BVH4 overlay
    1.58 > binary 1.52 > bf16-quantized overlay 1.30 — so "f32" when that
    table fits SMEM, None (binary tables) when only they do, "bf16" (half
    the f32-wide bytes, conservatively dilated boxes) next, and "paged"
    (top of the wide tree resident, the rest DMA'd per visit from HBM
    rows) when no full table fits — the Pallas kernel no longer has a
    scene-size cliff (the reference's traversal has none either,
    TerraBVH.c:250-310: CPU caches page its node array transparently)."""
    nw = getattr(bvh, "num_wide", 0)
    if nw <= 0:
        return None
    if nw * (24 * 4 + 4 * 4) <= SMEM_NODE_BUDGET:
        return "f32"
    if _binary_bytes(bvh) <= SMEM_NODE_BUDGET:
        return None
    if nw * (12 * 4 + 4 * 4) <= SMEM_NODE_BUDGET:
        return "bf16"
    return "paged"


def use_wide(bvh) -> bool:
    """Traverse the BVH4 overlay when it exists and fits SMEM."""
    return wide_mode(bvh) is not None


def pack_tables_auto(bvh, tri_a, tri_b, tri_c):
    """The table set matching what :func:`raycast` will traverse."""
    mode = wide_mode(bvh)
    if mode == "paged":
        return pack_tables_paged(bvh, tri_a, tri_b, tri_c)
    if mode is not None:
        return pack_tables_wide(bvh, tri_a, tri_b, tri_c, box_enc=mode)
    return pack_tables(bvh, tri_a, tri_b, tri_c)


def _traverse_pallas(bvh, nodes, links, tris, o, d, interpret: bool = False,
                     packet_rows: int = 8, algo: str = "mt",
                     queue: int = QUEUE, row_groups: int = ROW_GROUPS,
                     push_mode: str = "entry", ways: int = 1,
                     arity: int = 2, box_enc: str = "f32",
                     t_max=None, any_hit: bool = False,
                     count_steps: bool = False,
                     paged_rows=None, s_resident: int = 0,
                     npq: int = PAGED_QUEUE,
                     row_mask: bool | None = None,
                     pops_per_iter: int = 1,
                     start_links=None):
    """o, d: (N, 3) with N a multiple of packet_rows*128. ``packet_rows`` is
    the BLOCK row count per grid step; with ``ways`` > 1 it splits into
    ``ways`` independent packets of packet_rows/ways rows each. ``t_max``:
    (N,) seeds per-ray best-t (occlusion queries)."""
    n = (o[0] if isinstance(o, tuple) else o).shape[0]
    num_packets = n // (packet_rows * 128)
    rows = num_packets * packet_rows
    # Static SMEM-stack guard (the kernel's only unbounded structure):
    # ordered DFS grows the stack by <= arity-1 per level, so the worst
    # case is depth+2 (binary) / 3*wide_depth+2 (BVH4 overlay — wide depth
    # is roughly half the binary depth). A tree too deep for STACK_DEPTH
    # fails HERE, at trace time, not as silent SMEM corruption at run time
    # (courtyard 242k: binary depth 18, wide depth 10 -> need 32 of 96).
    paged = paged_rows is not None
    if arity == 4:
        need = 3 * getattr(bvh, "wide_depth", 0) + 2
        if paged:
            # per-way stack: each of the way's npq drained paged slots
            # pushes up to 4 children on top of the fill loop's DFS bound
            need += 4 * npq
    else:
        need = getattr(bvh, "depth", 0) + 2
    assert need <= 2 or need <= STACK_DEPTH, (
        f"BVH needs a {need}-deep traversal stack "
        f"(STACK_DEPTH={STACK_DEPTH}); rebuild with a larger leaf_size"
    )
    assert packet_rows % max(ways, 1) == 0
    # Mosaic rejects ray blocks under 8 sublanes (CLAUDE.md): narrow packets
    # must interleave enough ways to fill the (8k, 128) block.
    assert packet_rows % 8 == 0, f"block rows {packet_rows} must be 8k"
    rows_pp = packet_rows // max(ways, 1)
    # Row-masked dense leaf test (arity-4 paths): leaf children
    # direct-queue at the parent pop with an 8-bit active-row mask; rows
    # with no candidate lanes skip their dense tiles. MEASURED NEGATIVE on
    # this toolchain, kept selectable for the record (mega-1M primary,
    # Mrays/s): off 15.8, fill-only 12.9-13.7, full 12.4-12.9; courtyard
    # off 27.6, full 23.1. Despite iterations dropping 32% (13.7k->9.4k)
    # and ~2.6/8 row occupancy, BOTH rowbits acquisition forms (eager
    # per-child rowmin reductions; lazy in-branch recompute) cost more
    # than they save, and the masked drain's 8 pl.when regions per leaf
    # visit eat the dense savings — Mosaic branch overhead is ~300 cycles,
    # the same wall the round-2 row-band lever hit. Default stays OFF.
    if row_mask is None:
        row_mask = False
    if not (arity == 4 and row_mask):
        row_mask = False
    if row_mask:
        queue = max(queue, 8)

    def plane(v):
        return v.reshape(rows, 128)

    # o/d may arrive as (N,3) arrays or as component TUPLES (ox,oy,oz):
    # the payload-sort callers keep components separate to skip a
    # round-trip restack + column re-slice (round 5).
    if isinstance(o, tuple):
        o_c, d_c = o, d
    else:
        o_c = (o[:, 0], o[:, 1], o[:, 2])
        d_c = (d[:, 0], d[:, 1], d[:, 2])

    comps = [plane(o_c[0]), plane(o_c[1]), plane(o_c[2]),
             plane(d_c[0]), plane(d_c[1]), plane(d_c[2])]
    if t_max is not None:
        comps.append(plane(t_max))

    ray_spec = pl.BlockSpec((packet_rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    ni = bvh.num_wide if arity == 4 else bvh.num_internal
    kernel = functools.partial(
        _kernel, ni=ni, num_leaves=bvh.num_leaves,
        leaf_size=bvh.leaf_size, algo=algo, nq=queue, row_groups=row_groups,
        push_mode=push_mode, ways=ways, rows_pp=rows_pp, arity=arity,
        box_enc=box_enc,
        has_tmax=t_max is not None, any_hit=any_hit,
        count_steps=count_steps,
        s_resident=s_resident, npq=npq if paged else 0,
        row_mask=row_mask, pops_per_iter=pops_per_iter,
        has_starts=start_links is not None,
    )
    n_out = 3 if count_steps else 2
    table_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # node boxes (flat)
        pl.BlockSpec(memory_space=pltpu.SMEM),   # child links (flat)
        pl.BlockSpec(memory_space=pl.ANY),       # tris: HBM rows
    ]
    tables = [nodes, links, tris]
    if start_links is not None:
        assert start_links.shape[0] == num_packets * max(ways, 1), (
            f"start_links {start_links.shape} != packets {num_packets} x "
            f"ways {ways}")
    scratch = [
        pltpu.VMEM((max(ways, 1) * queue, bvh.leaf_size, TRI_FIELDS),
                   jnp.float32),
        pltpu.SemaphoreType.DMA((max(ways, 1) * queue,)),
    ]
    if paged:
        table_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # paged rows
        tables.append(paged_rows)
        scratch += [
            pltpu.VMEM((max(ways, 1) * npq, PAGED_NODE_ROWS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((max(ways, 1) * npq,)),
        ]
    if start_links is not None:
        table_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # starts
        tables.append(start_links.astype(jnp.int32))
    out = pl.pallas_call(
        kernel,
        grid=(num_packets,),
        in_specs=[ray_spec] * len(comps) + table_specs,
        out_specs=[
            pl.BlockSpec((packet_rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] * n_out,
        out_shape=[
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        ] + ([jax.ShapeDtypeStruct((rows, 128), jnp.int32)] if count_steps else []),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*comps, *tables)
    best_t, best_i = out[0], out[1]
    if count_steps:
        return best_t.reshape(-1), best_i.reshape(-1), out[2].reshape(-1)
    return best_t.reshape(-1), best_i.reshape(-1)


# SMEM budget for the flat node-box + child-link tables. Empirically a
# 750 KB table compiled AND ran on this v5e toolchain (13.4k-leaf SAH tree)
# while 1 MB does not compile; leave headroom for the traversal stack and
# compiler-internal scalars. Bigger budget => smaller leaves stay on the
# fast kernel for larger scenes.
# Largest node-table bytes this toolchain's Mosaic accepts in SMEM:
# 791 KB (the 242k-courtyard f32-wide table) measured compiling + running;
# 1 MB does not compile (CLAUDE.md). 792 KB keeps a tested point inside.
SMEM_NODE_BUDGET = 792 << 10  # bytes


def fits_smem(bvh) -> bool:
    if use_wide(bvh):
        return True
    return _binary_bytes(bvh) <= SMEM_NODE_BUDGET


def supported(bvh) -> bool:
    """Whole scene drivable by the Pallas kernel on this toolchain.

    Only the SMEM node-table budget gates (wide BVH4 tables at ~40 B/leaf
    or the binary tables at ~64 B/leaf): the triangle table lives in HBM
    (per-leaf DMA), so the tri count is unbounded. ``scene.commit`` scales
    the leaf size so Sponza-class scenes stay under the node budget."""
    return fits_smem(bvh)


def count_decode(steps_flat, packet_rows: int):
    """Decode the lane-packed decomposition counters of a
    ``count_steps=True`` multi-way run into per-grid-step arrays:
    {iters, pops, leaves, paged}. ``iters`` = lockstep fill iterations
    (the serial scalar-loop length), ``pops`` = do-gated useful pops
    summed over ways (pops / (iters*ways) = interleave utilization),
    ``leaves`` = dense leaf tests run, ``paged`` = paged-node DMA visits."""
    a = np.asarray(steps_flat).reshape(-1, 128)
    g = a[::packet_rows]
    return {"iters": g[:, 0], "pops": g[:, 32],
            "leaves": g[:, 64], "paged": g[:, 96]}


def traverse_packed(bvh, packed, o, d, mode=None, **kw):
    """Bench/probe entry: run :func:`_traverse_pallas` on a pre-packed
    table set, dispatching on its layout (3-tuple = resident tables at
    ``mode`` encoding, 4-tuple = paged). Defaults to the interleaved
    coherent packet shape."""
    kw.setdefault("packet_rows", PACKET_ROWS * INTERLEAVE)
    kw.setdefault("ways", INTERLEAVE)
    if len(packed) == 4:
        nodes, links, tris, prows = packed
        res_bf16 = nodes.dtype == jnp.int32
        return _traverse_pallas(bvh, nodes, links, tris, o, d, arity=4,
                                box_enc="bf16" if res_bf16 else "f32",
                                paged_rows=prows,
                                s_resident=nodes.shape[0] // (12 if res_bf16 else 24),
                                **kw)
    mode = wide_mode(bvh) if mode is None else mode
    return _traverse_pallas(bvh, *packed, o, d, arity=4 if mode else 2,
                            box_enc=mode or "f32", **kw)


def raycast(scene, o, d, sort_rays: bool = True, interpret: bool = False,
            packed=None, algo: str = "mt", sort_mode: str = "octant",
            t_max=None, any_hit: bool = False, packet_shape=None,
            sort_hint=None, leaf_of_tri=None) -> RayHit:
    """Closest-hit via the Pallas ordered-stack packet traversal.

    ``packed``: optional (boxes, links, tris) from :func:`pack_tables` to
    avoid re-packing per call (XLA CSEs repeated packing inside one jit,
    but passing it is cheaper still). ``algo`` selects the leaf
    intersector: "mt" or "watertight" (TerraGeometry.c:25-31's switch,
    honored inside the hot kernel). ``sort_mode``: coherence key —
    "octant" is best for mixed/bounce rays; callers tracing known-coherent
    camera batches can pass "dir3" (measured +22% on sorted primaries).
    ``t_max``: optional (N,) per-ray maximum distance — seeds the
    traversal's best-t so subtrees/triangles beyond it are pruned (the
    shadow/occlusion query); ``hit`` then means "occluded within t_max".
    Scenes whose node table exceeds SMEM fall back to the XLA packet walk.
    """
    from . import traverse as xla_traverse

    bvh = scene.bvh
    if not fits_smem(bvh) and not interpret:
        return xla_traverse.raycast(scene, o, d, sort_rays=sort_rays, algo=algo,
                                    t_max=t_max, sort_hint=sort_hint,
                                    leaf_of_tri=leaf_of_tri)
    mode = wide_mode(bvh)
    tri_a, tri_b, tri_c = scene.geometry.corners()
    if packed is None:
        packed = pack_tables_auto(bvh, tri_a, tri_b, tri_c)
    if len(packed) == 4:  # paged pack (resident tables + HBM node rows)
        nodes, links, tris, prows = packed
        mode = "paged"
        # resident count + encoding from the packed table itself
        res_bf16 = nodes.dtype == jnp.int32
        s_res = nodes.shape[0] // (12 if res_bf16 else 24)
    else:
        nodes, links, tris = packed
        prows, s_res, res_bf16 = None, 0, False
    n = o.shape[0]
    tm = t_max

    order = None
    if sort_rays and n > PACKET:
        root = 0 if bvh.num_internal > 0 else bvh.num_internal
        if sort_hint is not None and leaf_of_tri is not None:
            # parent-hit hierarchy keys (xla_traverse.hinted_keys: measured
            # 6.0 -> 8.2 Mrays/s on realistic bounce batches)
            keys = xla_traverse.hinted_keys(leaf_of_tri, sort_hint, d)
        else:
            keys = xla_traverse._sort_keys(o, d, bvh.node_min[root], bvh.node_max[root],
                                           mode=sort_mode, bvh=bvh)
        # Reorder via ONE multi-operand lax.sort carrying the components
        # and an index payload: argsort + (N,3) row-gathers measured
        # 5.7 ms/1M rays on this toolchain (HBM row-gather granularity)
        # vs 1.5 ms for the payload sort (round 5, scripts in CLAUDE.md).
        iota = jnp.arange(n, dtype=jnp.int32)
        ops = (keys, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2])
        if tm is not None:
            ops = ops + (tm,)
        srt = jax.lax.sort(ops + (iota,), num_keys=1)
        o = srt[1:4]     # stay component-wise all the way to the kernel
        d = srt[4:7]
        if tm is not None:
            tm = srt[7]
        order = srt[-1]

    # Interleaved packets per grid step: one packet's reduction/scalar
    # latency (the dominant pop cost) hides under the others' vector work.
    # ``packet_shape`` = (rows per packet, interleaved ways); None picks the
    # measured default per coherence class — (8, 4) for BOTH classes:
    # narrow packets measured WORSE on incoherent rays (union saturation;
    # see CLAUDE.md round-3 numbers), so INCOH_* stay at the wide shape.
    if packet_shape is None:
        packet_shape = (PACKET_ROWS, INTERLEAVE) if sort_mode == "dir3" \
            else (INCOH_ROWS, INCOH_WAYS)
    rows_pp, ways = packet_shape
    blk = rows_pp * 128 * ways
    if n < blk:  # small batches: one classic 8-row packet
        rows_pp, ways = PACKET_ROWS, 1
        blk = PACKET
    pad = -n % blk
    if pad:
        if isinstance(o, tuple):
            zp = jnp.zeros((pad,), jnp.float32)
            op = jnp.ones((pad,), jnp.float32)
            o = tuple(jnp.concatenate([c, zp]) for c in o)
            d = tuple(jnp.concatenate([c, op]) for c in d)
        else:
            o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)], axis=0)
            d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)], axis=0)
        if tm is not None:
            tm = jnp.concatenate([tm, jnp.zeros((pad,), tm.dtype)], axis=0)

    best_t, best_i = _traverse_pallas(bvh, nodes, links, tris, o, d, interpret,
                                      packet_rows=rows_pp * ways, ways=ways,
                                      arity=4 if mode else 2,
                                      box_enc=("bf16" if res_bf16 else "f32")
                                      if mode == "paged" else (mode or "f32"),
                                      algo=algo, t_max=tm, any_hit=any_hit,
                                      paged_rows=prows, s_resident=s_res)
    best_t = best_t[:n]
    best_i = best_i[:n]
    if order is not None:
        # unsort by sorting on the carried original indices (exact: the
        # index payload is a permutation) — same payload-sort trick as
        # the forward reorder, ~4x cheaper than inverse-gathering
        _, best_t, best_i = jax.lax.sort((order, best_t, best_i),
                                         num_keys=1)
    hit = best_t < (T_FAR if t_max is None else t_max)
    return RayHit(
        t=jax.lax.stop_gradient(best_t),
        tri=jax.lax.stop_gradient(jnp.where(hit, best_i, 0)),
        hit=hit,
    )
