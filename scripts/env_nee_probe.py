"""Measure the env-NEE proposal's per-bounce cost at config-2 lane count
(chained-gather audit after the light-table find): envmap.sample (inverse
CDF with per-lane conditional-row gathers + take_along_axis) and
envmap.pdf, plus a full env_nee render step for context.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import terra_tpu as tt  # noqa: E402
from terra_tpu import envmap  # noqa: E402


def timed(fn, *args, label="", reps=5):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"  {label:28s}: {dt*1e3:8.2f} ms (compile {comp:.1f}s)", flush=True)
    return dt


def main():
    import dataclasses

    n = 1 << 18
    scene = tt.scenes.cornell_box()
    scene = dataclasses.replace(
        scene, env_value=jnp.asarray([0.5, 0.6, 0.7], jnp.float32)
    )
    dist = jax.jit(lambda: envmap.build_distribution(scene))()
    rng = np.random.default_rng(0)
    e1 = jnp.asarray(rng.random(n, np.float32))
    e2 = jnp.asarray(rng.random(n, np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))

    timed(jax.jit(lambda e1, e2: envmap.sample(dist, e1, e2)[0]), e1, e2,
          label=f"envmap.sample ({n} lanes)")
    timed(jax.jit(lambda d: envmap.pdf(dist, d)), d,
          label="envmap.pdf")


if __name__ == "__main__":
    main()
