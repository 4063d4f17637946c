"""Measure TPU cost of the per-raycast coherence sort at production size.

(a) jnp.argsort of 24-bit keys at N=1.18M (what every raycast pays today)
(b) radix-partition permutation on the top 12 bits (packet-granularity
    grouping; within-bucket order irrelevant for packet coherence)

For scale: a full pt.raycast on realistic bounce rays at this N costs
~200 ms (scripts/cfg3b_probe.py) vs the ~0.05 ms sort measured here.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

N = 384 * 384 * 8


def radix_order(keys, bits: int, lo: int):
    """Stable LSB-first radix permutation of the bit range [lo, lo+bits)."""
    order = jnp.arange(keys.shape[0], dtype=jnp.int32)
    k = keys
    for b in range(lo, lo + bits):
        bit = (k >> jnp.uint32(b)) & jnp.uint32(1)
        zeros = bit == 0
        c0 = jnp.cumsum(zeros.astype(jnp.int32))
        total0 = c0[-1]
        c1 = jnp.cumsum((~zeros).astype(jnp.int32))
        pos = jnp.where(zeros, c0 - 1, total0 + c1 - 1)
        order = jnp.zeros_like(order).at[pos].set(order)
        k = jnp.zeros_like(k).at[pos].set(k)
    return order


def timed(label, fn, *args):
    fn_j = jax.jit(fn)
    t0 = time.perf_counter()
    jax.block_until_ready(fn_j(*args))
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        out = fn_j(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 5
    print(f"{label:34s}: {dt*1e3:8.2f} ms  (compile {comp:5.1f}s)", flush=True)
    return out


rng = np.random.default_rng(0)
keys = jnp.asarray(rng.integers(0, 1 << 24, N).astype(np.uint32))

timed("argsort 24-bit keys", lambda k: jnp.argsort(k), keys)
timed("radix top-12 (bits 12..24)", lambda k: radix_order(k, 12, 12), keys)
timed("radix top-8 (bits 16..24)", lambda k: radix_order(k, 8, 16), keys)

# sanity: radix top-12 groups keys by their top-12 bits exactly
o = np.asarray(jax.jit(lambda k: radix_order(k, 12, 12))(keys))
kk = np.asarray(keys)[o] >> 12
assert (np.diff(kk.astype(np.int64)) >= 0).all(), "radix grouping broken"
print("radix grouping verified (top-12 bits nondecreasing)")
