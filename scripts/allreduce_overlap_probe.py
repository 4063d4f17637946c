"""Evidence probe: does the scene-parameter gradient all-reduce overlap
the backward wavefront sweep? (BASELINE north star; VERDICT r3 missing #4.)

Method: compile optim.make_train_step_sharded on the 8-device virtual CPU
mesh and analyze the OPTIMIZED HLO SCHEDULE (the compiler's actual op
order — stronger than a wall-clock trace, which on shared CPU silicon
mostly measures oversubscription):

  * count `all-reduce-start` / `all-reduce-done` pairs (asynchronous
    collectives: XLA split the reduce so compute can run in between) vs
    synchronous `all-reduce` ops;
  * for each async pair, count the non-trivial compute ops scheduled
    BETWEEN start and done — that count IS the overlap;
  * report where in the schedule the gradient reduces sit (position as a
    fraction of the module) — reduces packed at the very end would mean
    XLA serialized them after the whole backward sweep.

Writes a human-readable report to stdout; docs/PARITY.md cites the run.
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import re  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import terra_tpu as tt  # noqa: E402
from terra_tpu import optim  # noqa: E402
from terra_tpu.ops import rng as rng_mod  # noqa: E402
from terra_tpu.parallel.mesh import make_mesh  # noqa: E402


def main():
    mesh = make_mesh((4, 2))
    scene = tt.scenes.cornell_box()
    cam = tt.scenes.cornell_camera()
    opts = tt.RenderOptions(width=16, height=16, samples_per_pixel=8, bounces=2,
                            integrator=tt.Integrator.DIRECT)
    k0, k1 = rng_mod.key_from_seed(0)
    key = jnp.array([k0, k1], jnp.uint32)
    target = jnp.zeros((16, 16, 3), jnp.float32)
    optimizer = optax.adam(1e-2)
    params = optim.extract_params(scene, ("attrs", "emissive"))
    state = optim.TrainState(params, optimizer.init(params), jnp.int32(0))
    import argparse
    chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    print(f"grad_chunks = {chunks}")
    step = optim.make_train_step_sharded(cam, opts, target, optimizer, mesh,
                                         grad_chunks=chunks)

    lowered = jax.jit(step).lower(state, scene, key)
    pre = lowered.as_text()
    n_pre = pre.count("all_reduce") + pre.count("all-reduce")
    print(f"pre-optimization module: {n_pre} all_reduce ops "
          f"(the per-chunk psum structure before XLA's combiner pass)")
    compiled = lowered.compile()
    hlo = compiled.as_text()

    lines = hlo.splitlines()
    # main computation body: the ENTRY schedule
    op_lines = [ln for ln in lines if re.search(r"%?\S+ = ", ln)]
    n_ops = len(op_lines)
    starts = [i for i, ln in enumerate(op_lines) if "all-reduce-start" in ln]
    dones = [i for i, ln in enumerate(op_lines) if "all-reduce-done" in ln]
    syncs = [i for i, ln in enumerate(op_lines)
             if re.search(r"= \S* ?all-reduce\(", ln)]

    print(f"HLO ops (assignment lines): {n_ops}")
    print(f"async all-reduce pairs: {len(starts)} start / {len(dones)} done")
    print(f"sync all-reduce ops:    {len(syncs)}")
    for i, (s, d) in enumerate(zip(starts, dones)):
        between = [ln for ln in op_lines[s + 1:d]
                   if not re.search(r"(parameter|constant|tuple|bitcast|copy)\b", ln)]
        print(f"  pair {i}: schedule positions {s}->{d} "
              f"({s / n_ops:.0%}..{d / n_ops:.0%} of module), "
              f"{len(between)} non-trivial ops in flight window")
    for i in syncs:
        print(f"  sync all-reduce at position {i} ({i / n_ops:.0%} of module)")

    # where does the backward sweep end? crude marker: the last dot/conv or
    # fusion before the optimizer's elementwise tail
    fusion_pos = [i for i, ln in enumerate(op_lines) if "fusion" in ln]
    if fusion_pos:
        print(f"last fusion at position {fusion_pos[-1]} "
              f"({fusion_pos[-1] / n_ops:.0%} of module)")

    # run one step for sanity
    out_state, loss = jax.jit(step)(state, scene, key)
    print(f"step sanity: loss {float(loss):.6f} finite "
          f"{bool(np.isfinite(float(loss)))}")


if __name__ == "__main__":
    main()
