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
    per leaf slot, tri ids float-encoded into lane 9) and each visited
    leaf's rows are DMA'd into a VMEM scratch slab on demand — leaf
    working sets scale with the scene while VMEM usage stays constant;
  * each grid step owns a packet of 1024 rays as (8, 128) component
    planes; AABB and Moller-Trumbore tests are dense VPU ops;
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

from ..intersect import RayHit, T_FAR

__all__ = ["raycast", "pack_tables", "PACKET"]

PACKET = 1024  # rays per packet: (8, 128) f32 register planes
STACK_DEPTH = 96
EPS = np.float32(1e-4)
BOX_FIELDS = 8   # minx,miny,minz,maxx,maxy,maxz,pad,pad -> 16 nodes/row
LINK_FIELDS = 2  # left,right -> 64 nodes/row
TRI_FIELDS = 128  # one full lane row per triangle: ax..cz (9), tri_id (9),
                  # rest pad — HBM rows must be 128-aligned for DMA slicing


def _lane_iota():
    return jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)


def _extract(row, lane_idx):
    """Scalar at a dynamic lane position of a (1, 128) f32 row."""
    return jnp.sum(jnp.where(_lane_iota() == lane_idx, row, 0.0))


def _extract_i32(row, lane_idx):
    return jnp.sum(jnp.where(_lane_iota() == lane_idx, row, 0))


def _kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            nodes_ref, links_ref, tris_ref,
            best_t_ref, best_i_ref,
            *rest,
            ni: int, num_leaves: int, leaf_size: int, tris_in_vmem: bool,
            count_steps: bool = False):
    if count_steps:
        steps_ref, tri_scratch, dma_sem = rest
    else:
        steps_ref = None
        tri_scratch, dma_sem = rest
    ox = ox_ref[...]
    oy = oy_ref[...]
    oz = oz_ref[...]
    dx = dx_ref[...]
    dy = dy_ref[...]
    dz = dz_ref[...]
    inv = lambda v: jnp.where(jnp.abs(v) > 1e-12, 1.0 / v, jnp.float32(1e12))
    idx_, idy, idz = inv(dx), inv(dy), inv(dz)

    best_t_ref[...] = jnp.full(ox.shape, T_FAR, jnp.float32)
    best_i_ref[...] = jnp.zeros(ox.shape, jnp.int32)

    def child_entry(node):
        """Packet AABB test vs node -> min entry t (T_FAR on miss).

        Box fields are scalar SMEM loads broadcast into the vector slab
        test; the single masked-min reduction doubles as the any-hit test
        (entry < T_FAR)."""
        b = node * 6
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
        hit = (tmax > jnp.maximum(tmin, 0.0)) & (tmin < best_t_ref[...])
        return jnp.min(jnp.where(hit, tmin, T_FAR))

    def leaf_test(leaf_id):
        """MT the packet against a leaf of the lane-packed VMEM table:
        triangle fields are packed 8-per-row and read with one-hot
        extraction (one cross-lane reduction per field)."""

        def tri_body(k, _):
            slot = leaf_id * leaf_size + k
            row = tris_ref[slot // 8].reshape(1, 128)
            base = (slot % 8) * 16

            def f(j):
                return _extract(row, base + j)

            ax, ay, az = f(0), f(1), f(2)
            bx, by, bz = f(3), f(4), f(5)
            cx, cy, cz = f(6), f(7), f(8)
            tri_id = f(9).astype(jnp.int32)  # float-encoded id (< 2^24)
            e1x, e1y, e1z = bx - ax, by - ay, bz - az
            e2x, e2y, e2z = cx - ax, cy - ay, cz - az
            hx = dy * e2z - dz * e2y
            hy = dz * e2x - dx * e2z
            hz = dx * e2y - dy * e2x
            det = e1x * hx + e1y * hy + e1z * hz
            invd = 1.0 / jnp.where(jnp.abs(det) > EPS, det, 1.0)
            sx, sy, sz = ox - ax, oy - ay, oz - az
            u = invd * (sx * hx + sy * hy + sz * hz)
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            v = invd * (dx * qx + dy * qy + dz * qz)
            t = invd * (e2x * qx + e2y * qy + e2z * qz)
            ok = (
                (jnp.abs(det) > EPS)
                & (u >= 0.0) & (u <= 1.0)
                & (v >= 0.0) & (u + v <= 1.0)
                & (t > EPS)
                & (t < best_t_ref[...])
            )
            best_t_ref[...] = jnp.where(ok, t, best_t_ref[...])
            best_i_ref[...] = jnp.where(ok, tri_id, best_i_ref[...])
            return 0

        jax.lax.fori_loop(0, leaf_size, tri_body, 0)

    def leaf_test_dense():
        """Dense MT over the DMA scratch: CH triangles x the whole packet
        at once. Triangle fields become (CH,1,1) columns (sublane = slot,
        static lane slice — no one-hot extraction, no scalar round trips)
        broadcast against the (R,128) ray planes; per-leaf reduction is an
        elementwise min-tree over the sublane-batch axis, and the winning
        tri id rides a float min with the same mask (ids < 2^24 are exact
        in f32)."""
        CH = min(8, leaf_size)
        tri = tri_scratch[...]
        for c in range(-(-leaf_size // CH)):
            sub = tri[c * CH:min((c + 1) * CH, leaf_size)]

            def col(j):
                return sub[:, j].reshape(-1, 1, 1)

            ax, ay, az = col(0), col(1), col(2)
            bx, by, bz = col(3), col(4), col(5)
            cx, cy, cz = col(6), col(7), col(8)
            idf = col(9)
            e1x, e1y, e1z = bx - ax, by - ay, bz - az
            e2x, e2y, e2z = cx - ax, cy - ay, cz - az
            hx = dy * e2z - dz * e2y        # (CH, R, 128)
            hy = dz * e2x - dx * e2z
            hz = dx * e2y - dy * e2x
            det = e1x * hx + e1y * hy + e1z * hz
            invd = 1.0 / jnp.where(jnp.abs(det) > EPS, det, 1.0)
            sx, sy, sz = ox - ax, oy - ay, oz - az
            u = invd * (sx * hx + sy * hy + sz * hz)
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            v = invd * (dx * qx + dy * qy + dz * qz)
            t = invd * (e2x * qx + e2y * qy + e2z * qz)
            ok = (
                (jnp.abs(det) > EPS)
                & (u >= 0.0) & (u <= 1.0)
                & (v >= 0.0) & (u + v <= 1.0)
                & (t > EPS)
                & (t < best_t_ref[...])
            )
            t_m = jnp.where(ok, t, T_FAR)
            tmin = jnp.min(t_m, axis=0)     # (R, 128)
            idm = jnp.min(jnp.where(t_m <= tmin[None], idf, jnp.float32(3e7)),
                          axis=0)
            better = tmin < best_t_ref[...]
            best_i_ref[...] = jnp.where(better, idm.astype(jnp.int32),
                                        best_i_ref[...])
            best_t_ref[...] = jnp.where(better, tmin, best_t_ref[...])

    def leaf_fetch(leaf_id):
        dma = pltpu.make_async_copy(
            tris_ref.at[pl.ds(leaf_id * leaf_size, leaf_size)],
            tri_scratch, dma_sem,
        )
        dma.start()
        return dma

    def run(stack_ref):
        def body(state):
            sp, steps = state
            sp = sp - 1
            node = stack_ref[sp]
            is_leaf = node >= ni

            if tris_in_vmem:
                @pl.when(is_leaf)
                def _():
                    leaf_test(node - ni)
            else:
                # DMA variant: issue the copy unconditionally right after
                # the pop (leaf row 0 for internal nodes — wasted bandwidth
                # but predicated DMA hangs the Mosaic compiler) and let it
                # fly UNDER the child AABB tests below; only the dense MT
                # is predicated. For leaf pops the child tests are dead
                # work anyway (pushes are ~is_leaf-gated), so the overlap
                # costs nothing.
                safe_leaf = jnp.where(is_leaf, node - ni, 0)
                dma = leaf_fetch(safe_leaf)

            safe_node = jnp.where(is_leaf, 0, node)
            l = links_ref[2 * safe_node]
            r = links_ref[2 * safe_node + 1]
            lentry = child_entry(l)
            rentry = child_entry(r)
            near_first = lentry <= rentry
            first = jnp.where(near_first, l, r)
            second = jnp.where(near_first, r, l)
            push2 = (~is_leaf) & (jnp.maximum(lentry, rentry) < T_FAR)
            push1 = (~is_leaf) & (jnp.minimum(lentry, rentry) < T_FAR)

            @pl.when(push2)
            def _():
                stack_ref[sp] = second

            sp = sp + push2.astype(jnp.int32)

            @pl.when(push1)
            def _():
                stack_ref[sp] = first

            sp = sp + push1.astype(jnp.int32)

            if not tris_in_vmem:
                dma.wait()

                @pl.when(is_leaf)
                def _():
                    leaf_test_dense()

            return sp, steps + 1

        if ni == 0:
            if tris_in_vmem:
                leaf_test(jnp.int32(0))
            else:
                leaf_fetch(jnp.int32(0)).wait()
                leaf_test_dense()
            if steps_ref is not None:
                steps_ref[...] = jnp.ones_like(best_i_ref[...])
        else:
            cap = jnp.int32(8 * (ni + num_leaves) + 64)
            stack_ref[0] = jnp.int32(0)
            _, steps = jax.lax.while_loop(
                lambda state: (state[0] > 0) & (state[1] < cap),
                body,
                (jnp.int32(1), jnp.int32(0)),
            )
            if steps_ref is not None:
                steps_ref[...] = jnp.full_like(best_i_ref[...], steps)

    pl.run_scoped(run, pltpu.SMEM((STACK_DEPTH,), jnp.int32))


def pack_tables(bvh, tri_a, tri_b, tri_c, tris_in_vmem: bool = True):
    """Pack the tree for the kernel (once per (scene, bvh)).

    Returns (nodes, links, tris):
      nodes : (Nn*6,) f32 flat SMEM box table —
              node n's minx,miny,minz,maxx,maxy,maxz at [6n, 6n+6)
      links : (max(ni,1)*2,) i32 flat SMEM child table
      tris  : tris_in_vmem: (ceil(C*L/8), 128) f32 — 8 tri slots x 16
              fields per lane row (VMEM-resident);
              else (C*L, 128) f32 HBM rows, one per slot.
      lane/field 9 holds the float-encoded global tri id.
    """
    ni = bvh.num_internal
    nodes = jnp.concatenate([bvh.node_min, bvh.node_max], axis=1).reshape(-1)
    if ni > 0:
        links = jnp.stack([bvh.node_left, bvh.node_right], axis=1).reshape(-1)
    else:
        links = jnp.zeros((2,), jnp.int32)

    leaf_flat = bvh.leaf_tri.reshape(-1)
    corners = jnp.concatenate(
        [tri_a[leaf_flat], tri_b[leaf_flat], tri_c[leaf_flat]], axis=1
    )  # (C*L, 9)
    slots = corners.shape[0]
    if tris_in_vmem:
        padded_slots = -(-slots // 8) * 8
        tris = jnp.zeros((padded_slots, 16), jnp.float32)
        tris = tris.at[:slots, :9].set(corners)
        tris = tris.at[:slots, 9].set(leaf_flat.astype(jnp.float32))
        tris = tris.reshape(padded_slots // 8, 128)
    else:
        tris = jnp.zeros((slots, TRI_FIELDS), jnp.float32)
        tris = tris.at[:, :9].set(corners)
        tris = tris.at[:, 9].set(leaf_flat.astype(jnp.float32))
    return nodes, links, tris


def _traverse_pallas(bvh, nodes, links, tris, o, d, interpret: bool = False,
                     tris_in_vmem: bool = True, packet_rows: int = 8,
                     count_steps: bool = False):
    """o, d: (N, 3) with N a multiple of packet_rows*128."""
    n = o.shape[0]
    num_packets = n // (packet_rows * 128)
    rows = num_packets * packet_rows

    def plane(v):
        return v.reshape(rows, 128)

    comps = [plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
             plane(d[:, 0]), plane(d[:, 1]), plane(d[:, 2])]

    ray_spec = pl.BlockSpec((packet_rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _kernel, ni=bvh.num_internal, num_leaves=bvh.num_leaves,
        leaf_size=bvh.leaf_size, tris_in_vmem=tris_in_vmem,
        count_steps=count_steps,
    )
    tri_space = pltpu.VMEM if tris_in_vmem else pltpu.ANY
    n_out = 3 if count_steps else 2
    out = pl.pallas_call(
        kernel,
        grid=(num_packets,),
        in_specs=[ray_spec] * 6 + [
            pl.BlockSpec(memory_space=pltpu.SMEM),   # node boxes (flat)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # child links (flat)
            pl.BlockSpec(memory_space=tri_space),    # tris: VMEM or HBM
        ],
        out_specs=[
            pl.BlockSpec((packet_rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] * n_out,
        out_shape=[
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        ] + ([jax.ShapeDtypeStruct((rows, 128), jnp.int32)] if count_steps else []),
        scratch_shapes=[
            pltpu.VMEM((bvh.leaf_size, TRI_FIELDS), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(*comps, nodes, links, tris)
    best_t, best_i = out[0], out[1]
    if count_steps:
        return best_t.reshape(-1), best_i.reshape(-1), out[2].reshape(-1)
    return best_t.reshape(-1), best_i.reshape(-1)


# VMEM budget for the lane-packed triangle table (~16 f32 per tri): scenes
# above this fall back to the XLA traversal until the HBM-DMA kernel path
# compiles on this toolchain.
VMEM_TRI_BUDGET = 8 << 20  # bytes (73k tris verified compiling + fast on v5e)

# SMEM budget for the flat node-box + child-link tables. Empirically a
# 512 KB SMEM scratch compiles on this v5e toolchain and 1 MB does not;
# leave headroom for the traversal stack and compiler-internal scalars.
SMEM_NODE_BUDGET = 440 << 10  # bytes


def fits_vmem(bvh) -> bool:
    return bvh.num_leaves * bvh.leaf_size * 16 * 4 <= VMEM_TRI_BUDGET


def fits_smem(bvh) -> bool:
    nn = 2 * bvh.num_leaves - 1 if bvh.num_leaves else 1
    return nn * 6 * 4 + max(bvh.num_internal, 1) * 2 * 4 <= SMEM_NODE_BUDGET


def supported(bvh) -> bool:
    """Whole scene drivable by the Pallas kernel on this toolchain.

    Only the SMEM node-table budget gates now: the triangle table lives in
    HBM (per-leaf DMA), so the tri count is unbounded. ``scene.commit``
    scales the LBVH leaf size so Sponza-class scenes stay under the node
    budget."""
    return fits_smem(bvh)


def raycast(scene, o, d, sort_rays: bool = True, interpret: bool = False,
            packed=None, use_dma: bool = True) -> RayHit:
    """Closest-hit via the Pallas ordered-stack packet traversal.

    ``packed``: optional (boxes, links, tris) from :func:`pack_tables` to
    avoid re-packing per call (XLA CSEs repeated packing inside one jit,
    but passing it is cheaper still). Default layout is the HBM triangle
    table + per-leaf DMA + dense MT (measured 1.8-2.8x over the VMEM
    one-hot-extract variant, any scene size); ``use_dma=False`` keeps the
    legacy lane-packed VMEM table. Scenes whose node table exceeds SMEM
    fall back to the XLA packet walk.
    """
    from . import traverse as xla_traverse

    bvh = scene.bvh
    tris_in_vmem = not use_dma
    too_big = (tris_in_vmem and not fits_vmem(bvh)) or not fits_smem(bvh)
    if too_big and not interpret:
        return xla_traverse.raycast(scene, o, d, sort_rays=sort_rays)
    tri_a, tri_b, tri_c = scene.geometry.corners()
    if packed is None:
        packed = pack_tables(bvh, tri_a, tri_b, tri_c, tris_in_vmem)
    nodes, links, tris = packed
    n = o.shape[0]

    order = None
    if sort_rays and n > PACKET:
        root = 0 if bvh.num_internal > 0 else bvh.num_internal
        keys = xla_traverse._sort_keys(o, d, bvh.node_min[root], bvh.node_max[root])
        order = jnp.argsort(keys)
        o = o[order]
        d = d[order]

    pad = -n % PACKET
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)], axis=0)
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)], axis=0)

    best_t, best_i = _traverse_pallas(bvh, nodes, links, tris, o, d, interpret, tris_in_vmem)
    best_t = best_t[:n]
    best_i = best_i[:n]
    if order is not None:
        inv = jnp.zeros_like(order).at[order].set(jnp.arange(n, dtype=order.dtype))
        best_t = best_t[inv]
        best_i = best_i[inv]
    hit = best_t < T_FAR
    return RayHit(
        t=jax.lax.stop_gradient(best_t),
        tri=jax.lax.stop_gradient(jnp.where(hit, best_i, 0)),
        hit=hit,
    )
