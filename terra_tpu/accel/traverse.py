"""Packet BVH traversal: vectorized closest-hit over the LBVH.

TPU re-design of terra_bvh_traverse (/root/reference/src/TerraBVH.c:250-310).
The reference walks a per-ray explicit stack — per-lane pointer chasing that
a SIMD machine cannot vectorize. Here rays are grouped into *packets* that
share one traversal stack (classic coherent packet tracing, mapped to the
VPU):

  * per-iteration work is packet-granular: popping node ids, fetching node
    AABBs and leaf triangle rows are all gathers of ~num_packets rows
    (thousands, not millions — cheap on TPU),
  * the expensive lanes-wide work (ray/AABB tests, Moller-Trumbore leaf
    tests) is dense and fixed-shape: (packets, rays_per_packet, ...) with
    masking,
  * a packet prunes a subtree when no member ray can hit it closer than its
    current best (any-reduction over the packet),
  * the whole loop is one ``lax.while_loop`` — one compiled program, no
    host round trips.

Packet dilation (rays paying for leaves only siblings need) is the cost of
coherence; primary rays are pixel-coherent by construction and secondary
rays still amortize node fetches. The Pallas short-stack per-core variant is
the planned v2 for incoherent workloads.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..intersect import RayHit, T_FAR, moller_trumbore
from ..ops import math3

__all__ = ["raycast", "PACKET_SIZE", "STACK_DEPTH"]

PACKET_SIZE = 64
STACK_DEPTH = 96


def _packet_raycast(bvh, tri_a, tri_b, tri_c, o, d):
    """o, d: (P2, P, 3). Returns (best_t, best_tri) of shape (P2, P)."""
    p2, p, _ = o.shape
    ni = bvh.num_internal
    leaf_size = bvh.leaf_size
    inv_d = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, jnp.float32(1e12))

    # flattened leaf corner tables for fast leaf fetch: (C*L, 3)
    leaf_tri_flat = bvh.leaf_tri.reshape(-1)
    la = tri_a[leaf_tri_flat].reshape(bvh.num_leaves, leaf_size, 3)
    lb = tri_b[leaf_tri_flat].reshape(bvh.num_leaves, leaf_size, 3)
    lc = tri_c[leaf_tri_flat].reshape(bvh.num_leaves, leaf_size, 3)

    def aabb_any_hit(box_min, box_max, best_t):
        """box_*: (P2, 3); rays (P2, P, 3) -> per-packet any-hit (P2,)."""
        t1 = (box_min[:, None, :] - o) * inv_d
        t2 = (box_max[:, None, :] - o) * inv_d
        tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
        tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
        hit = (tmax > jnp.maximum(tmin, 0.0)) & (tmin < best_t)
        return jnp.any(hit, axis=1)

    def body(state):
        stack, sp, best_t, best_i = state
        alive = sp > 0
        sp1 = jnp.maximum(sp - 1, 0)
        top = stack[jnp.arange(p2), sp1]
        top = jnp.where(alive, top, 0)
        is_leaf_node = (top >= ni) & alive
        is_internal = (~(top >= ni)) & alive
        sp = sp1  # popped

        # ---- internal: test children AABBs, push hits
        safe_top = jnp.minimum(top, jnp.maximum(ni - 1, 0))
        lch = bvh.node_left[safe_top]
        rch = bvh.node_right[safe_top]
        lhit = aabb_any_hit(bvh.node_min[lch], bvh.node_max[lch], best_t) & is_internal
        rhit = aabb_any_hit(bvh.node_min[rch], bvh.node_max[rch], best_t) & is_internal
        # push right first, then left (left processed first)
        rows = jnp.arange(p2)
        stack = stack.at[rows, jnp.minimum(sp, STACK_DEPTH - 1)].set(
            jnp.where(rhit, rch, stack[rows, jnp.minimum(sp, STACK_DEPTH - 1)])
        )
        sp = sp + rhit.astype(jnp.int32)
        stack = stack.at[rows, jnp.minimum(sp, STACK_DEPTH - 1)].set(
            jnp.where(lhit, lch, stack[rows, jnp.minimum(sp, STACK_DEPTH - 1)])
        )
        sp = sp + lhit.astype(jnp.int32)

        # ---- leaf: test the packet's rays against the leaf triangles
        leaf_id = jnp.where(is_leaf_node, top - ni, 0)
        a = la[leaf_id]  # (P2, L, 3)
        b = lb[leaf_id]
        c = lc[leaf_id]
        valid, t, _, _ = moller_trumbore(
            o[:, :, None, :], d[:, :, None, :], a[:, None], b[:, None], c[:, None]
        )  # (P2, P, L)
        t = jnp.where(valid & is_leaf_node[:, None, None], t, T_FAR)
        t_best_l = jnp.min(t, axis=2)
        arg_l = jnp.argmin(t, axis=2)
        tri_l = bvh.leaf_tri[leaf_id[:, None], arg_l]  # (P2, P) gather (small)
        take = t_best_l < best_t
        best_t = jnp.where(take, t_best_l, best_t)
        best_i = jnp.where(take, tri_l, best_i)
        return stack, sp, best_t, best_i

    def cond(state):
        _, sp, _, _ = state
        return jnp.any(sp > 0)

    stack0 = jnp.zeros((p2, STACK_DEPTH), jnp.int32)
    if ni > 0:
        sp0 = jnp.ones((p2,), jnp.int32)  # root = internal node 0
    else:
        # single-leaf tree: root IS the leaf (id ni + 0 == 0)
        stack0 = stack0.at[:, 0].set(ni)
        sp0 = jnp.ones((p2,), jnp.int32)
    best_t0 = jnp.full((p2, p), T_FAR, jnp.float32)
    best_i0 = jnp.zeros((p2, p), jnp.int32)
    _, _, best_t, best_i = jax.lax.while_loop(
        cond, body, (stack0, sp0, best_t0, best_i0)
    )
    return best_t, best_i


def raycast(scene, o, d, packet_size: int = PACKET_SIZE) -> RayHit:
    """Closest-hit via LBVH packet traversal. o, d: (N, 3)."""
    bvh = scene.bvh
    tri_a, tri_b, tri_c = scene.geometry.corners()
    n = o.shape[0]
    pad = -n % packet_size
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)], axis=0)
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)], axis=0)
    p2 = o.shape[0] // packet_size
    best_t, best_i = _packet_raycast(
        bvh,
        tri_a, tri_b, tri_c,
        o.reshape(p2, packet_size, 3),
        d.reshape(p2, packet_size, 3),
    )
    best_t = best_t.reshape(-1)[:n]
    best_i = best_i.reshape(-1)[:n]
    hit = best_t < T_FAR
    return RayHit(
        t=jax.lax.stop_gradient(best_t),
        tri=jax.lax.stop_gradient(jnp.where(hit, best_i, 0)),
        hit=hit,
    )
