"""Pallas TPU kernel: ordered-stack BVH packet traversal.

The north-star kernel (BASELINE.json: "stackless LBVH Pallas kernel over an
HBM-resident flattened node/triangle buffer"): the reference's per-ray
stack traversal (/root/reference/src/TerraBVH.c:250-310) re-architected for
the TPU memory system:

  * node boxes and child links are packed 128-to-a-lane-row
    ((num_rows, 128) arrays, 16 nodes' boxes or 64 nodes' link-pairs per
    row) so the whole tree fits VMEM without tile padding — a (N, 3)
    layout would pad 3 -> 128 lanes and blow VMEM 42x;
  * per-node fields are read with one-hot lane extraction (iota == lane
    compare + reduce), the TPU-native substitute for dynamic lane
    indexing;
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
            boxes_ref, links_ref, tris_ref,
            best_t_ref, best_i_ref,
            tri_scratch, dma_sem,
            *, ni: int, num_leaves: int, leaf_size: int, tris_in_vmem: bool):
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

    def box_test(node):
        """Packet AABB test vs node -> (any_hit, min_entry_t)."""
        row = boxes_ref[node // 16].reshape(1, 128)
        base = (node % 16) * BOX_FIELDS
        bminx = _extract(row, base + 0)
        bminy = _extract(row, base + 1)
        bminz = _extract(row, base + 2)
        bmaxx = _extract(row, base + 3)
        bmaxy = _extract(row, base + 4)
        bmaxz = _extract(row, base + 5)
        t1x = (bminx - ox) * idx_
        t2x = (bmaxx - ox) * idx_
        t1y = (bminy - oy) * idy
        t2y = (bmaxy - oy) * idy
        t1z = (bminz - oz) * idz
        t2z = (bmaxz - oz) * idz
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        hit = (tmax > jnp.maximum(tmin, 0.0)) & (tmin < best_t_ref[...])
        any_hit = jnp.any(hit)
        entry = jnp.min(jnp.where(hit, tmin, T_FAR))
        return any_hit, entry

    def children(node):
        row = links_ref[node // 64].reshape(1, 128)
        base = (node % 64) * LINK_FIELDS
        return _extract_i32(row, base), _extract_i32(row, base + 1)

    def leaf_test(leaf_id, skip_dma: bool = False):
        """MT the packet against the leaf's triangles.

        tris_in_vmem: triangle fields are lane-packed 8-per-row in VMEM and
        read with one-hot extraction. Otherwise the leaf's rows are DMA'd
        from HBM into scratch (issued by the caller when skip_dma).
        """
        if not tris_in_vmem and not skip_dma:
            dma = pltpu.make_async_copy(
                tris_ref.at[pl.ds(leaf_id * leaf_size, leaf_size)], tri_scratch, dma_sem
            )
            dma.start()
            dma.wait()

        def tri_body(k, _):
            if tris_in_vmem:
                slot = leaf_id * leaf_size + k
                row = tris_ref[slot // 8].reshape(1, 128)
                base = (slot % 8) * 16

                def f(j):
                    return _extract(row, base + j)
            else:
                def f(j):  # static lane index: plain scalar load
                    return tri_scratch[k, j]

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
                # DMA variant: the copy is issued unconditionally (leaf row 0
                # for internal nodes — wasted but predicated DMA hangs the
                # Mosaic compiler); only the MT update is predicated.
                safe_leaf = jnp.where(is_leaf, node - ni, 0)
                dma = pltpu.make_async_copy(
                    tris_ref.at[pl.ds(safe_leaf * leaf_size, leaf_size)],
                    tri_scratch, dma_sem,
                )
                dma.start()
                dma.wait()

                @pl.when(is_leaf)
                def _():
                    leaf_test(safe_leaf, skip_dma=True)

            safe_node = jnp.where(is_leaf, 0, node)
            l, r = children(safe_node)
            lhit, lentry = box_test(l)
            rhit, rentry = box_test(r)
            near_first = lentry <= rentry
            first = jnp.where(near_first, l, r)
            second = jnp.where(near_first, r, l)
            first_hit = jnp.where(near_first, lhit, rhit)
            second_hit = jnp.where(near_first, rhit, lhit)
            push2 = (~is_leaf) & second_hit
            push1 = (~is_leaf) & first_hit

            @pl.when(push2)
            def _():
                stack_ref[sp] = second

            sp = sp + push2.astype(jnp.int32)

            @pl.when(push1)
            def _():
                stack_ref[sp] = first

            sp = sp + push1.astype(jnp.int32)
            return sp, steps + 1

        if ni == 0:
            leaf_test(jnp.int32(0))
        else:
            cap = jnp.int32(8 * (ni + num_leaves) + 64)
            stack_ref[0] = jnp.int32(0)
            jax.lax.while_loop(
                lambda state: (state[0] > 0) & (state[1] < cap),
                body,
                (jnp.int32(1), jnp.int32(0)),
            )

    pl.run_scoped(run, pltpu.SMEM((STACK_DEPTH,), jnp.int32))


def pack_tables(bvh, tri_a, tri_b, tri_c, tris_in_vmem: bool = True):
    """Lane-pack the tree for the kernel (once per (scene, bvh)).

    Returns (boxes, links, tris):
      boxes : (ceil(Nn/16), 128) f32 — 16 nodes x 8 fields per row
      links : (ceil(ni/64), 128) i32 — 64 nodes x [left, right] per row
      tris  : tris_in_vmem: (ceil(C*L/8), 128) f32 — 8 tri slots x 16
              fields per lane row (VMEM-resident);
              else (C*L, 128) f32 HBM rows, one per slot.
      lane/field 9 holds the float-encoded global tri id.
    """
    nn = bvh.node_min.shape[0]
    ni = bvh.num_internal
    rows = -(-nn // 16)
    boxes = jnp.zeros((rows * 16, BOX_FIELDS), jnp.float32)
    boxes = boxes.at[:nn, 0:3].set(bvh.node_min)
    boxes = boxes.at[:nn, 3:6].set(bvh.node_max)
    boxes = boxes.reshape(rows, 128)

    lrows = max(-(-ni // 64), 1)
    links = jnp.zeros((lrows * 64, LINK_FIELDS), jnp.int32)
    if ni > 0:
        links = links.at[:ni, 0].set(bvh.node_left)
        links = links.at[:ni, 1].set(bvh.node_right)
    links = links.reshape(lrows, 128)

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
    return boxes, links, tris


def _traverse_pallas(bvh, boxes, links, tris, o, d, interpret: bool = False,
                     tris_in_vmem: bool = True):
    """o, d: (N, 3) with N a multiple of PACKET."""
    n = o.shape[0]
    num_packets = n // PACKET
    rows = num_packets * 8

    def plane(v):
        return v.reshape(rows, 128)

    comps = [plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
             plane(d[:, 0]), plane(d[:, 1]), plane(d[:, 2])]

    ray_spec = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _kernel, ni=bvh.num_internal, num_leaves=bvh.num_leaves,
        leaf_size=bvh.leaf_size, tris_in_vmem=tris_in_vmem,
    )
    tri_space = pltpu.VMEM if tris_in_vmem else pltpu.ANY
    best_t, best_i = pl.pallas_call(
        kernel,
        grid=(num_packets,),
        in_specs=[ray_spec] * 6 + [
            pl.BlockSpec(memory_space=pltpu.VMEM),   # boxes
            pl.BlockSpec(memory_space=pltpu.VMEM),   # links
            pl.BlockSpec(memory_space=tri_space),    # tris: VMEM or HBM
        ],
        out_specs=[
            pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bvh.leaf_size, TRI_FIELDS), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(*comps, boxes, links, tris)
    return best_t.reshape(-1), best_i.reshape(-1)


# VMEM budget for the lane-packed triangle table (~16 f32 per tri): scenes
# above this fall back to the XLA traversal until the HBM-DMA kernel path
# compiles on this toolchain.
VMEM_TRI_BUDGET = 8 << 20  # bytes (73k tris verified compiling + fast on v5e)


def fits_vmem(bvh) -> bool:
    return bvh.num_leaves * bvh.leaf_size * 16 * 4 <= VMEM_TRI_BUDGET


def raycast(scene, o, d, sort_rays: bool = True, interpret: bool = False,
            packed=None, use_dma: bool = False) -> RayHit:
    """Closest-hit via the Pallas ordered-stack packet traversal.

    ``packed``: optional (boxes, links, tris) from :func:`pack_tables` to
    avoid re-packing per call (XLA CSEs repeated packing inside one jit,
    but passing it is cheaper still). Scenes whose triangle table exceeds
    the VMEM budget fall back to the XLA packet walk unless ``use_dma``.
    """
    from . import traverse as xla_traverse

    bvh = scene.bvh
    tris_in_vmem = not use_dma
    if tris_in_vmem and not fits_vmem(bvh) and not interpret:
        return xla_traverse.raycast(scene, o, d, sort_rays=sort_rays)
    tri_a, tri_b, tri_c = scene.geometry.corners()
    if packed is None:
        packed = pack_tables(bvh, tri_a, tri_b, tri_c, tris_in_vmem)
    boxes, links, tris = packed
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

    best_t, best_i = _traverse_pallas(bvh, boxes, links, tris, o, d, interpret, tris_in_vmem)
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
