"""Mosaic pattern probes for the ROW-MASKED dense leaf test (round 5).

The 3m decomposition (scripts/cfg3m_decompose.py) measured dense leaf
chunks at 73% of traversal time while the offline packet simulation
(occupancy probe) measured only ~2.6 of 8 sublane rows active per leaf
visit — so a dense test tiled as (8-tri-sublane x 128-ray-lane) VREGs,
gated per ray ROW, cuts leaf work to ~1/3. These tiny kernels compile the
risky patterns separately (run each under `timeout 150 python ... N`;
hangs = Mosaic compiler, the known failure mode on this toolchain):

  1: single-ROW vector store to the output block (o_ref[r] = (128,) vec)
     under pl.when, static row index
  2: tri-in-sublane tile math: (8,1) tri column x (1,128) ray row ->
     (8,128) VREG, min-reduce over sublanes -> (128,), store to row r
  3: row-activity bits packed into TWO scalars by weighted sum reductions
     (rows 0-3 / 4-7, 8 bits each), scalar bit-test driving pl.when
  4: dynamic-index VMEM mask-plane store inside a while_loop (the
     queue-time hit-mask save), then a drain-time read + re-prune
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, W = 8, 128


def _run(kernel, x, scratch, out_shape=None):
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((ROWS, W), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=out_shape or jax.ShapeDtypeStruct((ROWS, W), jnp.float32),
        scratch_shapes=scratch,
    )(x)


def probe1():
    """Row stores: o_ref[r] = vec under pl.when(bit r of a scalar)."""
    def kernel(x_ref, o_ref, vmem, sem):
        cp = pltpu.make_async_copy(x_ref.at[pl.ds(0, 8)], vmem, sem)
        cp.start()
        cp.wait()
        o_ref[...] = jnp.zeros((ROWS, W), jnp.float32)
        bits = jnp.int32(0b10100110)
        for r in range(ROWS):
            @pl.when(((bits >> r) & 1) > 0)
            def _(r=r):
                o_ref[r] = vmem[r] * 2.0

    x = jnp.arange(16 * W, dtype=jnp.float32).reshape(16, W)
    out = np.asarray(_run(kernel, x,
                          [pltpu.VMEM((8, W), jnp.float32),
                           pltpu.SemaphoreType.DMA]))
    expect = np.zeros((ROWS, W), np.float32)
    for r in range(ROWS):
        if (0b10100110 >> r) & 1:
            expect[r] = np.asarray(x)[r] * 2.0
    ok = np.array_equal(out, expect)
    print("probe1 row-store:", "OK" if ok else "FAIL")


def probe2():
    """Tri-sublane tile: (8,1) x (1,128) -> (8,128), sublane min -> row."""
    def kernel(x_ref, o_ref, vmem, sem):
        cp = pltpu.make_async_copy(x_ref.at[pl.ds(0, 8)], vmem, sem)
        cp.start()
        cp.wait()
        tri = vmem[...]              # (8, W): 8 "tris" x fields in lanes
        o_ref[...] = jnp.zeros((ROWS, W), jnp.float32)
        ray_plane = vmem[...]        # reuse as the ray rows
        for r in range(ROWS):
            row = ray_plane[r].reshape(1, W)          # (1,128) ray row
            col = tri[:, r].reshape(ROWS, 1)          # (8,1) tri field col
            tile = col * row + col                     # (8,128) VREG math
            red = jnp.min(tile, axis=0)                # (128,)
            o_ref[r] = red

    x = jnp.arange(16 * W, dtype=jnp.float32).reshape(16, W)
    out = np.asarray(_run(kernel, x,
                          [pltpu.VMEM((8, W), jnp.float32),
                           pltpu.SemaphoreType.DMA]))
    xa = np.asarray(x)[:8]
    expect = np.zeros((ROWS, W), np.float32)
    for r in range(ROWS):
        tile = xa[:, r:r + 1] * xa[r][None, :] + xa[:, r:r + 1]
        expect[r] = tile.min(axis=0)
    ok = np.allclose(out, expect)
    print("probe2 tri-sublane tile:", "OK" if ok else "FAIL")


def probe3():
    """Row-activity bits: cross-lane max -> (8,1), shift by row iota, sum
    to ONE scalar (<=255, carry-free), scalar bit-tests drive pl.when."""
    def kernel(x_ref, o_ref, vmem, sem):
        cp = pltpu.make_async_copy(x_ref.at[pl.ds(0, 8)], vmem, sem)
        cp.start()
        cp.wait()
        plane = vmem[...]
        hit = plane > 700.0  # some rows fully below, some have hits
        rowany = jnp.max(hit.astype(jnp.int32), axis=1, keepdims=True)  # (8,1)
        riota = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0)
        bits = jnp.sum(rowany << riota)
        o_ref[...] = jnp.zeros((ROWS, W), jnp.float32)
        for r in range(ROWS):
            @pl.when(((bits >> r) & 1) > 0)
            def _(r=r):
                o_ref[r] = jnp.full((W,), 1.0, jnp.float32)

    x = jnp.arange(16 * W, dtype=jnp.float32).reshape(16, W)
    out = np.asarray(_run(kernel, x,
                          [pltpu.VMEM((8, W), jnp.float32),
                           pltpu.SemaphoreType.DMA]))
    expect = (np.asarray(x)[:8] > 700.0).any(axis=1, keepdims=True) * np.ones(
        (1, W), np.float32)
    ok = np.array_equal(out, expect)
    print("probe3 rowbits:", "OK" if ok else "FAIL")


def probe4():
    """Queue-time mask save: dynamic-slot VMEM plane store in a while_loop,
    then a drain read + per-row gating (the full mask round-trip)."""
    def kernel(x_ref, o_ref, mask_scr, vmem, sem):
        cp = pltpu.make_async_copy(x_ref.at[pl.ds(0, 8)], vmem, sem)
        cp.start()
        cp.wait()
        plane = vmem[...]

        def body(state):
            i = state
            mask_scr[i] = jnp.where(plane > (600.0 + 100.0 * i.astype(jnp.float32)),
                                    plane, 1e9)
            return i + 1

        jax.lax.while_loop(lambda i: i < 3, body, jnp.int32(0))
        o_ref[...] = jnp.zeros((ROWS, W), jnp.float32)
        riota = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0)
        for slot in range(3):
            m = mask_scr[slot]
            hit = m < 1e9
            rowany = jnp.max(hit.astype(jnp.int32), axis=1, keepdims=True)
            bits = jnp.sum(rowany << riota)
            for r in range(ROWS):
                @pl.when(((bits >> r) & 1) > 0)
                def _(r=r, slot=slot):
                    o_ref[r] = o_ref[r] + m[r]

    x = jnp.arange(16 * W, dtype=jnp.float32).reshape(16, W)
    out = np.asarray(pl.pallas_call(
        lambda x_ref, o_ref, mask_scr, vmem, sem: kernel(
            x_ref, o_ref, mask_scr, vmem, sem),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((ROWS, W), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((4, ROWS, W), jnp.float32),
                        pltpu.VMEM((8, W), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(x))
    xa = np.asarray(x)[:8]
    expect = np.zeros((ROWS, W), np.float32)
    for slot in range(3):
        m = np.where(xa > 600.0 + 100.0 * slot, xa, 1e9).astype(np.float32)
        hitrows = (m < 1e9).any(axis=1)
        for r in range(ROWS):
            if hitrows[r]:
                expect[r] += m[r]
    ok = np.allclose(out, expect)
    print("probe4 mask round-trip:", "OK" if ok else "FAIL")


if __name__ == "__main__":
    {1: probe1, 2: probe2, 3: probe3, 4: probe4}[int(sys.argv[1])]()
