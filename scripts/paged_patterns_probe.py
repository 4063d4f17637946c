"""Bisect which paged-kernel pattern hangs Mosaic on this toolchain.

Each probe is a tiny kernel compiled separately (run with a per-probe
timeout from the shell: `timeout 150 python ... N`); the binary search for
the hang avoids burning 10-minute timeouts on the full traversal kernel.

  1: HBM->VMEM DMA inside a while_loop + (128,) row-vector read + min
     reduction (the proven leaf pattern + the paged box read)
  2: pattern 1 + STATIC scalar element read vmem[j, r, c]
  3: pattern 1 + replicated-row scalar extraction via jnp.min reduction
  4: pattern 3 + a conditional pl.when push to SMEM driven by the scalar
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, W = 8, 128


def _run(kernel, x, scratch):
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((ROWS, W), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, W), jnp.float32),
        scratch_shapes=scratch,
    )(x)


def probe1():
    def kernel(x_ref, o_ref, vmem, sem):
        def body(state):
            i, acc = state
            cp = pltpu.make_async_copy(x_ref.at[pl.ds(i * 4, 4)], vmem, sem)
            cp.start()
            cp.wait()
            row = vmem[1]  # (128,) vector
            return i + 1, acc + jnp.min(row)

        _, acc = jax.lax.while_loop(lambda s: s[0] < 3, body,
                                    (jnp.int32(0), jnp.float32(0)))
        o_ref[...] = jnp.full((ROWS, W), acc, jnp.float32)

    x = jnp.arange(16 * W, dtype=jnp.float32).reshape(16, W)
    out = _run(kernel, x, [pltpu.VMEM((4, W), jnp.float32), pltpu.SemaphoreType.DMA])
    expect = sum(float(x[i * 4 + 1].min()) for i in range(3))
    got = float(np.asarray(out)[0, 0])
    print(f"probe1 vector-row: got {got} expect {expect}",
          "OK" if got == expect else "FAIL")


def probe2():
    def kernel(x_ref, o_ref, vmem, sem):
        def body(state):
            i, acc = state
            cp = pltpu.make_async_copy(x_ref.at[pl.ds(i * 4, 4)], vmem, sem)
            cp.start()
            cp.wait()
            s = vmem[1, 3]  # static scalar element read from VMEM
            return i + 1, acc + s

        _, acc = jax.lax.while_loop(lambda s: s[0] < 3, body,
                                    (jnp.int32(0), jnp.float32(0)))
        o_ref[...] = jnp.full((ROWS, W), acc, jnp.float32)

    x = jnp.arange(16 * W, dtype=jnp.float32).reshape(16, W)
    out = _run(kernel, x, [pltpu.VMEM((4, W), jnp.float32), pltpu.SemaphoreType.DMA])
    expect = sum(float(x[i * 4 + 1, 3]) for i in range(3))
    got = float(np.asarray(out)[0, 0])
    print(f"probe2 scalar-elem: got {got} expect {expect}",
          "OK" if got == expect else "FAIL")


def probe3():
    def kernel(x_ref, o_ref, vmem, sem):
        def body(state):
            i, acc = state
            cp = pltpu.make_async_copy(x_ref.at[pl.ds(i * 4, 4)], vmem, sem)
            cp.start()
            cp.wait()
            s = jnp.min(vmem[2])  # replicated row -> reduction scalar
            return i + 1, acc + s

        _, acc = jax.lax.while_loop(lambda s: s[0] < 3, body,
                                    (jnp.int32(0), jnp.float32(0)))
        o_ref[...] = jnp.full((ROWS, W), acc, jnp.float32)

    x = jnp.tile(jnp.arange(16, dtype=jnp.float32)[:, None], (1, W))
    out = _run(kernel, x, [pltpu.VMEM((4, W), jnp.float32), pltpu.SemaphoreType.DMA])
    expect = sum(float(x[i * 4 + 2, 0]) for i in range(3))
    got = float(np.asarray(out)[0, 0])
    print(f"probe3 replicated-reduce: got {got} expect {expect}",
          "OK" if got == expect else "FAIL")


def probe4():
    def kernel(x_ref, o_ref, vmem, sem):
        def run(stack_ref):
            def body(state):
                i, acc = state
                cp = pltpu.make_async_copy(x_ref.at[pl.ds(i * 4, 4)], vmem, sem)
                cp.start()
                cp.wait()
                link = jnp.min(vmem[2]).astype(jnp.int32)
                push = link > 4

                @pl.when(push)
                def _():
                    stack_ref[i] = link

                got = jnp.where(push, stack_ref[i], 0)
                return i + 1, acc + got.astype(jnp.float32)

            _, acc = jax.lax.while_loop(lambda s: s[0] < 3, body,
                                        (jnp.int32(0), jnp.float32(0)))
            o_ref[...] = jnp.full((ROWS, W), acc, jnp.float32)

        pl.run_scoped(run, pltpu.SMEM((8,), jnp.int32))

    x = jnp.tile(jnp.arange(16, dtype=jnp.float32)[:, None], (1, W))
    out = _run(kernel, x, [pltpu.VMEM((4, W), jnp.float32), pltpu.SemaphoreType.DMA])
    expect = sum(int(x[i * 4 + 2, 0]) if x[i * 4 + 2, 0] > 4 else 0 for i in range(3))
    got = float(np.asarray(out)[0, 0])
    print(f"probe4 scalar-push: got {got} expect {expect}",
          "OK" if got == float(expect) else "FAIL")


if __name__ == "__main__":
    {"1": probe1, "2": probe2, "3": probe3, "4": probe4}[sys.argv[1]]()
