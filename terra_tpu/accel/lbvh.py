"""LBVH build: Morton-ordered cluster tree over triangles.

TPU re-design of the reference BVH (/root/reference/src/TerraBVH.c): the
reference builds a per-triangle binary SAH tree (x-axis-only sweep,
TerraBVH.c:79-126) with 2-wide nodes and an explicit traversal stack
(TerraBVH.c:250-310). Pointer-chasing per ray is hostile to a SIMD machine,
so here:

  * triangles are sorted by the Morton code of their centroid (30-bit),
  * consecutive runs of ``leaf_size`` triangles become fixed-size leaves
    (uniform leaves -> fixed-shape vectorized leaf tests, no ragged work),
  * a Karras-2012 binary radix tree is built over the leaf Morton codes
    (vectorized, no recursion),
  * node AABBs are refit bottom-up (also vectorized),
  * the result is a flat SoA node table for the packet traversal in
    ``traverse.py`` — index arrays, not pointers.

Build runs host-side at commit time (NumPy), exactly like the reference's
terra_scene_commit -> terra_bvh_create path (Terra.c:162-191). ``refit``
re-computes AABBs only (for vertex edits / "mesh move", Scene.cpp:271-321).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LBVH", "build", "refit", "DEFAULT_LEAF_SIZE"]

DEFAULT_LEAF_SIZE = 16


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "node_min",
        "node_max",
        "node_left",
        "node_right",
        "node_is_leaf",
        "leaf_tri",
        "tri_order",
        "dfs_next",
        "dfs_skip",
        "wide_child",
        "wide_src",
    ],
    meta_fields=["leaf_size", "num_leaves", "num_wide", "depth",
                 "wide_depth"],
)
@dataclass
class LBVH:
    """Flat SoA tree. Internal nodes: 0..C-2; leaves indexed separately.

    node_min/max : (C-1+C, 3) AABBs in the unified id space: rows
                   0..C-2 are internal nodes, rows C-1.. are leaves (so a
                   child id indexes this array directly)
    node_left/right : (C-1,) child ids; value < C-1 = internal node id,
                      value >= C-1 encodes leaf id (value - (C-1))
    node_is_leaf : unused for internals (kept for clarity)
    leaf_tri : (C, leaf_size) global triangle ids per leaf (padded by
               repeating the last valid id; degenerate duplicates are
               harmless for closest-hit)
    tri_order : (T,) morton-sorted triangle permutation (for debugging)
    wide_child : (W, 4) i32 — BVH4 overlay topology (greedy area-ordered
                 collapse of the binary tree): wide node w's children, each
                 an internal wide id < W, or W + leaf_id, or -1 empty.
                 The binary tree stays canonical (XLA fallback, refit);
                 the Pallas kernel traverses this 4-wide view to halve the
                 pop count per ray.
    wide_src : (W, 4) i32 — the BINARY node id bounding each wide child
               (-1 empty). Child boxes are GATHERED from node_min/max at
               pack time, so ``refit`` keeps the wide view valid for free.
    leaf_size, num_leaves, num_wide : static metadata
    """

    node_min: jax.Array
    node_max: jax.Array
    node_left: jax.Array
    node_right: jax.Array
    node_is_leaf: jax.Array
    leaf_tri: jax.Array
    tri_order: jax.Array
    dfs_next: jax.Array  # (ni+C,) preorder successor (stackless threading)
    dfs_skip: jax.Array  # (ni+C,) preorder successor skipping the subtree
    wide_child: jax.Array
    wide_src: jax.Array
    leaf_size: int
    num_leaves: int
    num_wide: int
    # Max root->leaf node count of the binary tree (static, host-computed
    # at build): the Pallas kernel's SMEM stack worst case is depth+2
    # pushes for the ordered binary DFS and 3*depth+4 for the BVH4 overlay
    # — _traverse_pallas asserts both against STACK_DEPTH at trace time,
    # so an overflow is impossible at run time (the sanitizer analogue
    # for the kernel's only unbounded structure).
    depth: int = 0
    wide_depth: int = 0  # max root->slot level count of the BVH4 overlay

    @property
    def num_internal(self) -> int:
        return self.node_left.shape[0]


def _morton3(x: np.ndarray) -> np.ndarray:
    """Interleave 10 bits per axis -> 30-bit Morton codes. x in [0,1)^3."""
    q = np.clip((x * 1024.0).astype(np.uint64), 0, 1023)

    def expand(v):
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v

    return (expand(q[:, 0]) << np.uint64(2)) | (expand(q[:, 1]) << np.uint64(1)) | expand(q[:, 2])


def _karras_tree(codes: np.ndarray):
    """Vectorized Karras 2012 binary radix tree over sorted unique codes.

    codes: (C,) uint64, strictly increasing (uniqueness enforced by caller
    via appended index bits). Returns (left, right) child arrays for the
    C-1 internal nodes; child >= C-1 encodes leaf (child - (C-1)).
    """
    c = len(codes)
    if c == 1:
        return np.zeros((0,), np.int32), np.zeros((0,), np.int32)

    codes = codes.astype(np.uint64)

    def delta(i, j):
        """Common-prefix length between codes[i] and codes[j]; -1 out of
        range. i, j: int64 arrays."""
        out = np.full(i.shape, -1, np.int64)
        ok = (j >= 0) & (j < c)
        x = codes[i[ok]] ^ codes[j[ok]]
        # count leading zeros of 64-bit x (x != 0 guaranteed: codes unique)
        lz = 63 - np.floor(np.log2(x.astype(np.float64) + 0.5)).astype(np.int64)
        lz = np.where(x == 0, 64, lz)
        res = np.full(i.shape, -1, np.int64)
        res[ok] = lz
        return res

    i = np.arange(c - 1, dtype=np.int64)
    d = np.sign(delta(i, i + 1) - delta(i, i - 1)).astype(np.int64)
    d = np.where(d == 0, 1, d)

    # upper bound on range length
    delta_min = delta(i, i - d)
    lmax = np.full(c - 1, 2, np.int64)
    grow = np.ones(c - 1, bool)
    while grow.any():
        cand = i + lmax * d
        grow = delta(i, cand) > delta_min
        lmax = np.where(grow, lmax * 2, lmax)

    # binary search exact other end
    l = np.zeros(c - 1, np.int64)
    t = lmax // 2
    while (t >= 1).any():
        cand = i + (l + t) * d
        ok = delta(i, cand) > delta_min
        l = np.where((t >= 1) & ok, l + t, l)
        t = t // 2
    j = i + l * d

    # split search
    delta_node = delta(i, j)
    s = np.zeros(c - 1, np.int64)
    t = np.int64(1)
    # t iterates ceil(l / 2^k)
    max_l = int(l.max()) if len(l) else 0
    divs = []
    dv = 2
    while True:
        divs.append(dv)
        if dv >= max(max_l, 2):
            break
        dv *= 2
    for dv in divs:
        t = (l + dv - 1) // dv
        cand = i + (s + t) * d
        ok = delta(i, cand) > delta_node
        s = np.where(ok, s + t, s)
    gamma = i + s * d + np.minimum(d, 0)

    left = np.where(np.minimum(i, j) == gamma, gamma + (c - 1), gamma).astype(np.int32)
    right = np.where(np.maximum(i, j) == gamma + 1, gamma + 1 + (c - 1), gamma + 1).astype(np.int32)
    return left, right


def build(geometry, leaf_size: int | None = None, builder: str = "sah") -> LBVH:
    """Host-side BVH build from a Geometry (SURVEY.md §7 step 5).

    ``builder`` selects the native C++ builder (terra_tpu.native):
      "sah"  — binned SAH, 16 bins x 3 axes (default; the reference's
               builder is a sweep SAH, TerraBVH.c:79-126 — x-axis-only,
               which this strictly improves on). Leaves hold
               [leaf_size/2, leaf_size] triangles, padded by repetition.
      "lbvh" — Morton cluster LBVH (faster build; use for per-frame
               rebuilds of dynamic geometry).
    Falls back to the vectorized NumPy LBVH when the native library is
    unavailable.

    ``leaf_size=None`` auto-scales: the default leaf grows (in steps of 8,
    the dense-MT chunk width) until the flat node tables fit the Pallas
    traversal kernel's SMEM budget, so Sponza-class (250k-tri) scenes stay
    on the fast kernel instead of the XLA fallback."""
    pos = np.asarray(geometry.positions)
    vidx = np.asarray(geometry.tri_vidx)
    from .. import native
    from . import pallas_traverse as _pt

    # Auto leaf policy (round-4 measured, 1M-tri sweep in CLAUDE.md):
    #   * small scenes: grow until the FULL-PRECISION f32 BVH4 table fits
    #     (112 B/wide node) but only up to leaf 32 — f32-wide measured best
    #     on incoherent rays at 242k tris (1.58 Mrays/s vs binary 1.52,
    #     bf16 1.30) and small leaves keep dense tests cheap;
    #   * bigger scenes: grow until the bf16 table fits (64 B/wide node)
    #     up to leaf 64 — 1M tris measured 15.8 Mrays/s primary at
    #     bf16-full leaf 64 vs 13.5 at the old f32-full leaf 96 policy
    #     (leaf 72/80 regress: 15.3/14.1);
    #   * anything larger stays at leaf 64 and traverses PAGED (top of the
    #     wide tree SMEM-resident, the rest DMA'd per visit) — no size
    #     cliff, no XLA-walk fallback.
    F32_LEAF_CAP, BF16_LEAF_CAP = 32, 64

    def _est_fits(leaf, bytes_per_wide):
        leaves = max((len(vidx) + leaf - 1) // leaf, 1)
        return int(leaves * 0.55) * bytes_per_wide <= _pt.SMEM_NODE_BUDGET

    use_sah = builder == "sah" and native.available()
    auto = leaf_size is None
    if auto:
        leaf_size = DEFAULT_LEAF_SIZE
        # first estimate from ceil(T/L); SAH may produce up to 2x (half-full
        # leaves) — the actual count is re-checked after the build below
        while leaf_size < F32_LEAF_CAP and not _est_fits(leaf_size, 112):
            leaf_size += 8
        if not _est_fits(leaf_size, 112):
            while leaf_size < BF16_LEAF_CAP and not _est_fits(leaf_size, 64):
                leaf_size += 8

    nat = native.sah_build(pos, vidx, leaf_size) if use_sah else native.lbvh_build(pos, vidx, leaf_size)

    def _actual(nat):
        # the recheck uses the ACTUAL collapsed wide-node count, not the
        # 0.55/leaf estimate (which overshoots ~5% and needlessly grows
        # leaves right at the SMEM boundary — 242k courtyard: estimate
        # says leaf 32, the real table fits at leaf 24)
        wc, ws, nw, wd = _collapse4(nat["left"], nat["right"],
                                    nat["box_min"], nat["box_max"])
        return (wc, ws, nw, wd), nw

    def _needs_growth(nw, leaf):
        if leaf >= BF16_LEAF_CAP:
            return False  # paged mode handles any size from here
        per = 112 if leaf < F32_LEAF_CAP else 64
        return nw * per > _pt.SMEM_NODE_BUDGET

    collapsed, nw_actual = _actual(nat) if nat is not None else (None, 0)
    while (auto and use_sah and nat is not None
           and _needs_growth(nw_actual, leaf_size)):
        # data-dependent SAH leaf count overflowed the kernel's SMEM node
        # budget: grow leaves and rebuild (native build is ~100ms at 300k
        # tris, so the retry is cheap)
        leaf_size += 8
        nat = native.sah_build(pos, vidx, leaf_size)
        collapsed, nw_actual = _actual(nat)
    if nat is not None:
        c = nat["num_leaves"]
        wc, ws, nw, wd = collapsed
        return LBVH(
            node_min=jnp.asarray(nat["box_min"]),
            node_max=jnp.asarray(nat["box_max"]),
            node_left=jnp.asarray(nat["left"]),
            node_right=jnp.asarray(nat["right"]),
            node_is_leaf=jnp.zeros((max(c - 1, 0),), jnp.int32),
            leaf_tri=jnp.asarray(nat["leaf_tri"]),
            tri_order=jnp.asarray(nat["tri_order"]),
            dfs_next=jnp.asarray(nat["dfs_next"]),
            dfs_skip=jnp.asarray(nat["dfs_skip"]),
            wide_child=jnp.asarray(wc),
            wide_src=jnp.asarray(ws),
            leaf_size=leaf_size,
            num_leaves=c,
            num_wide=nw,
            depth=_tree_depth(nat["left"], nat["right"]),
            wide_depth=wd,
        )
    a, b, c3 = pos[vidx[:, 0]], pos[vidx[:, 1]], pos[vidx[:, 2]]
    t = len(vidx)

    centroid = (a + b + c3) / 3.0
    lo = centroid.min(axis=0)
    hi = centroid.max(axis=0)
    extent = np.maximum(hi - lo, 1e-12)
    codes = _morton3((centroid - lo) / extent)
    order = np.argsort(codes, kind="stable").astype(np.int32)

    num_leaves = (t + leaf_size - 1) // leaf_size
    # leaf triangle table, padded with the last valid tri of each leaf
    leaf_tri = np.zeros((num_leaves, leaf_size), np.int32)
    for k in range(leaf_size):
        idx = np.minimum(np.arange(num_leaves) * leaf_size + k, t - 1)
        leaf_tri[:, k] = order[idx]

    # unique leaf codes: representative code + leaf index in low bits
    leaf_code = codes[order[np.minimum(np.arange(num_leaves) * leaf_size, t - 1)]]
    leaf_code = (leaf_code.astype(np.uint64) << np.uint64(32)) | np.arange(
        num_leaves, dtype=np.uint64
    )
    left, right = _karras_tree(leaf_code)

    # bottom-up AABB refit (vectorized fixpoint over levels), unified
    # [internal; leaf] id space
    node_min, node_max = _refit_host(pos, vidx, leaf_tri, left, right)
    dfs_next, dfs_skip = _thread_tree(left, right, num_leaves)
    wc, ws, nw, wd = _collapse4(left, right, node_min, node_max)

    return LBVH(
        node_min=jnp.asarray(node_min),
        node_max=jnp.asarray(node_max),
        node_left=jnp.asarray(left),
        node_right=jnp.asarray(right),
        node_is_leaf=jnp.zeros((max(num_leaves - 1, 0),), jnp.int32),
        leaf_tri=jnp.asarray(leaf_tri),
        tri_order=jnp.asarray(order),
        dfs_next=jnp.asarray(dfs_next),
        dfs_skip=jnp.asarray(dfs_skip),
        wide_child=jnp.asarray(wc),
        wide_src=jnp.asarray(ws),
        leaf_size=leaf_size,
        num_leaves=num_leaves,
        num_wide=nw,
        depth=_tree_depth(left, right),
        wide_depth=wd,
    )


def _tree_depth(left, right) -> int:
    """Max root->leaf node count of the binary tree (host, at build)."""
    ni = len(left)
    if ni == 0:
        return 1
    mx = 1
    stack = [(0, 1)]
    while stack:
        n, dep = stack.pop()
        if dep > mx:
            mx = dep
        for c in (int(left[n]), int(right[n])):
            if c < ni:
                stack.append((c, dep + 1))
    return mx + 1  # + the leaf level


def _collapse4(left, right, node_min, node_max):
    """Greedy binary -> 4-wide collapse (host, at build time).

    Each wide node starts from a binary internal node's two children and
    repeatedly expands the largest-surface-area internal slot until four
    slots are filled (the standard SAH-guided collapse; the reference has
    no analogue — its 2-wide node is TerraBVH.h:12-22). Returns
    (wide_child, wide_src, n_wide, wide_depth); see the LBVH docstring
    for the encoding.
    """
    ni = len(left)
    if ni == 0:
        return (np.zeros((0, 4), np.int32), np.full((0, 4), -1, np.int32),
                0, 1)
    ext = np.maximum(node_max - node_min, 0.0)
    area = ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2] + ext[:, 0] * ext[:, 2]

    children: list = [None]  # children[w] = slot list of BINARY ids
    wide_of = {0: 0}
    wdepth = {0: 1}
    max_depth = 1
    work = [0]
    while work:
        b = work.pop()
        slots = [int(left[b]), int(right[b])]
        while len(slots) < 4:
            internals = [s for s in slots if s < ni]
            if not internals:
                break
            s = max(internals, key=lambda x: area[x])
            slots.remove(s)
            slots.extend([int(left[s]), int(right[s])])
        children[wide_of[b]] = slots
        for s in slots:
            if s < ni:
                wide_of[s] = len(children)
                wdepth[s] = wdepth[b] + 1
                if wdepth[s] > max_depth:
                    max_depth = wdepth[s]
                children.append(None)
                work.append(s)

    n_wide = len(children)
    wide_child = np.full((n_wide, 4), -1, np.int32)
    wide_src = np.full((n_wide, 4), -1, np.int32)
    for w, slots in enumerate(children):
        for j, s in enumerate(slots):
            wide_src[w, j] = s
            wide_child[w, j] = wide_of[s] if s < ni else n_wide + (s - ni)
    return wide_child, wide_src, n_wide, max_depth + 1  # + the leaf level


def _thread_tree(left, right, num_leaves):
    """Preorder threading for stackless traversal: for each node (unified id
    space: [0, ni) internal, [ni, ni+C) leaves) compute

      dfs_next[n] — the preorder successor when *descending* into n
                    (its left child for internals; == dfs_skip for leaves),
      dfs_skip[n] — the node that follows n's entire subtree (-1 at end).

    Traversal is then a pure pointer walk: hit -> dfs_next, miss ->
    dfs_skip. This is the 'stackless rope' scheme SURVEY.md §7 calls for —
    per-packet state is ONE integer, no stack scatters.
    """
    ni = len(left)
    total = ni + num_leaves
    dfs_next = np.full(total, -1, np.int64)
    dfs_skip = np.full(total, -1, np.int64)
    if ni == 0:
        return dfs_next.astype(np.int32), dfs_skip.astype(np.int32)

    # iterative preorder with explicit (node, continuation) stack
    stack = [(0, -1)]
    while stack:
        node, cont = stack.pop()
        dfs_skip[node] = cont
        if node < ni:
            l, r = int(left[node]), int(right[node])
            dfs_next[node] = l
            stack.append((r, cont))
            stack.append((l, r))
        else:
            dfs_next[node] = cont
    return dfs_next.astype(np.int32), dfs_skip.astype(np.int32)


def _leaf_bounds(pos, vidx, leaf_tri):
    tri = leaf_tri.reshape(-1)
    corners = np.stack(
        [pos[vidx[tri, 0]], pos[vidx[tri, 1]], pos[vidx[tri, 2]]], axis=1
    )  # (C*L, 3corners, 3)
    corners = corners.reshape(leaf_tri.shape[0], -1, 3)
    return corners.min(axis=1), corners.max(axis=1)


def _refit_host(pos, vidx, leaf_tri, left, right):
    """Bottom-up AABB computation; returns UNIFIED (ni + C, 3) boxes where
    rows [0, ni) are internal nodes and rows [ni, ni+C) are leaves."""
    ni = len(left)
    leaf_min, leaf_max = _leaf_bounds(pos, vidx, leaf_tri)
    c = leaf_min.shape[0]
    box_min = np.full((ni + c, 3), np.inf, np.float32)
    box_max = np.full((ni + c, 3), -np.inf, np.float32)
    box_min[ni:] = leaf_min
    box_max[ni:] = leaf_max
    known = np.zeros(ni + c, bool)
    known[ni:] = True

    for _ in range(ni + 1):
        if known.all():
            break
        ready = known[left] & known[right] & ~known[:ni]
        box_min[:ni][ready] = np.minimum(box_min[left[ready]], box_min[right[ready]])
        box_max[:ni][ready] = np.maximum(box_max[left[ready]], box_max[right[ready]])
        known[:ni] |= ready
    assert known.all(), "BVH refit did not converge (cycle?)"
    return box_min, box_max


def refit(bvh: LBVH, geometry) -> LBVH:
    """Re-fit AABBs for updated vertex positions (fixed topology) — the
    fast path for the reference's ``mesh move`` (Scene.cpp:271-321 forces a
    full rebuild; here topology-preserving edits just refit)."""
    import dataclasses

    pos = np.asarray(geometry.positions)
    vidx = np.asarray(geometry.tri_vidx)
    node_min, node_max = _refit_host(
        pos, vidx, np.asarray(bvh.leaf_tri), np.asarray(bvh.node_left), np.asarray(bvh.node_right)
    )
    return dataclasses.replace(
        bvh, node_min=jnp.asarray(node_min), node_max=jnp.asarray(node_max)
    )
