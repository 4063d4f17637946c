"""Probe: can Mosaic DMA HBM rows into SMEM scratch on this toolchain?

Decides the treelet-paging design for pallas_traverse: if HBM->SMEM copies
compile+run, paged wide-node treelets can keep the SCALAR box loads the
kernel's pop loop depends on; otherwise treelet nodes must land in VMEM
and pay the ~65-cycle one-hot scalar extraction per field.

Also probes the companion patterns the paged kernel needs:
  (b) an inner while_loop whose trip count is data-dependent on values
      read from the DMA'd SMEM scratch;
  (c) i32 rows (links) DMA'd HBM->SMEM alongside f32 box rows.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_hbm_to_smem():
    ROWS, W = 8, 128

    def kernel(x_ref, o_ref, smem, sem):
        # copy HBM row block -> SMEM scratch, then scalar-read it
        cp = pltpu.make_async_copy(x_ref.at[pl.ds(2, 2)], smem, sem)
        cp.start()
        cp.wait()
        s = smem[0, 0] + smem[1, 1] + smem[0, 127]
        o_ref[...] = jnp.full((ROWS, W), s, jnp.float32)

    x = jnp.arange(64 * W, dtype=jnp.float32).reshape(64, W)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((ROWS, W), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, W), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((2, W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(x)
    expect = float(x[2, 0] + x[3, 1] + x[2, 127])
    got = float(np.asarray(out)[0, 0])
    print(f"hbm->smem f32: got {got} expect {expect}", "OK" if got == expect else "FAIL")
    return got == expect


def probe_hbm_to_smem_i32_loop():
    ROWS, W = 8, 128

    def kernel(x_ref, o_ref, smem, sem):
        cp = pltpu.make_async_copy(x_ref.at[pl.ds(0, 4)], smem, sem)
        cp.start()
        cp.wait()

        # data-dependent inner loop driven by SMEM-scratch values
        def body(state):
            i, acc = state
            return i + 1, acc + smem[i % 4, i]

        n = smem[0, 0]  # = 5

        def cond(state):
            return state[0] < n

        _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
        o_ref[...] = jnp.full((ROWS, W), acc, jnp.int32)

    x = jnp.arange(8 * W, dtype=jnp.int32).reshape(8, W)
    x = x.at[0, 0].set(5)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((ROWS, W), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, W), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((4, W), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )(x)
    xs = np.asarray(x)
    expect = sum(int(xs[i % 4, i]) for i in range(5))
    got = int(np.asarray(out)[0, 0])
    print(f"hbm->smem i32 + data-dep loop: got {got} expect {expect}",
          "OK" if got == expect else "FAIL")
    return got == expect




def probe_smem_dma_in_while():
    """(d) the paged-kernel pattern: HBM->SMEM DMA started/waited INSIDE a
    lax.while_loop body (the leaf-DMA pattern, but with an SMEM dest)."""
    ROWS, W = 8, 128

    def kernel(x_ref, o_ref, smem, sem):
        def body(state):
            i, acc = state
            cp = pltpu.make_async_copy(x_ref.at[pl.ds(i, 1)], smem, sem)
            cp.start()
            cp.wait()
            return i + 1, acc + smem[0, 0]

        _, acc = jax.lax.while_loop(lambda s: s[0] < 4, body,
                                    (jnp.int32(0), jnp.float32(0)))
        o_ref[...] = jnp.full((ROWS, W), acc, jnp.float32)

    x = jnp.arange(8 * W, dtype=jnp.float32).reshape(8, W)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((ROWS, W), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, W), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((1, W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(x)
    expect = float(sum(x[i, 0] for i in range(4)))
    got = float(np.asarray(out)[0, 0])
    print(f"smem dma in while: got {got} expect {expect}",
          "OK" if got == expect else "FAIL")
    return got == expect


if __name__ == "__main__":
    ok = True
    for fn in (probe_hbm_to_smem, probe_hbm_to_smem_i32_loop, probe_smem_dma_in_while):
        try:
            ok &= fn()
        except Exception as e:  # noqa: BLE001
            print(f"{fn.__name__}: EXCEPTION {type(e).__name__}: {e}")
            ok = False
    sys.exit(0 if ok else 1)
