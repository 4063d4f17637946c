"""Deviceless AOT TPU-schedule capture for the chunked grad all-reduce
(VERDICT r4 next-round #5).

XLA:CPU provably serializes the per-chunk psums (allreduce_overlap_probe.py:
2 sync all-reduces at 99.7-100% of the schedule); XLA:TPU emits async
all-reduce-start/done pairs and schedules them with the latency-hiding
scheduler, but the only local chip is a single v5e (a 1-device mesh folds
the psum away). This probe asks for the optimized TPU HLO WITHOUT hardware:
``jax.experimental.topologies.get_topology_desc`` builds an abstract
multi-chip v5e topology, the sharded train step lowers against a Mesh over
its abstract devices, and ``.compile()`` runs the real TPU compiler
pipeline (including the latency-hiding scheduler) deviceless. The report
counts compute ops scheduled inside each all-reduce-start/done window —
that count IS the overlap the north star asks for. If this toolchain
cannot AOT-compile for a multi-chip topology, the exact failure is the
recorded evidence instead (docs/PARITY.md cites this run either way).
"""
import os
import sys
import re
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _big_tex_scene(res: int):
    """Cornell box whose floor/ceiling/back diffuse albedo reads a res^2
    HDR texture: the texture-DATA gradient is res*res*3*4 bytes (50 MB at
    res 2048), so the per-chunk grad psums are at the scale where XLA's
    collective combiner must NOT merge them and overlap matters. The
    small-param probe's grads are a few KB — merging those into one
    end-of-schedule reduce is the RIGHT schedule, and proves nothing
    about the north-star mechanism."""
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    import terra_tpu as tt
    from terra_tpu import scene as scene_mod
    from terra_tpu.scene import ATTR, TextureAtlas

    base = tt.scenes.cornell_box()
    rng = np.random.default_rng(0)
    data = (0.3 + 0.4 * rng.random((1, res, res, 3))).astype(np.float32)
    atlas = TextureAtlas(
        data=jnp.asarray(data),
        size=jnp.asarray([[res, res]], jnp.int32),
        filter=jnp.asarray([1], jnp.int32),
        address=jnp.asarray([0], jnp.int32),
    )
    attr_tex = np.asarray(base.materials.attr_tex).copy()
    attr_tex[0, ATTR.DIFFUSE_ALBEDO] = 0
    mats = dataclasses.replace(base.materials,
                               attr_tex=jnp.asarray(attr_tex))
    return scene_mod.commit(base.geometry, mats, textures=atlas)


def main():
    chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    topo_name = sys.argv[2] if len(sys.argv) > 2 else "v5e:2x4"
    tex_res = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    import jax
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    print(f"jax {jax.__version__}; requesting abstract topology {topo_name}")
    try:
        topo = topologies.get_topology_desc(
            platform="tpu", topology_name=topo_name)
        devs = topo.devices
        print(f"topology ok: {len(devs)} abstract devices "
              f"({devs[0].device_kind if devs else '?'})")
    except Exception as e:
        print("TOPOLOGY UNAVAILABLE (recorded as the evidence):")
        traceback.print_exc()
        print(f"AOT-REFUSAL: get_topology_desc({topo_name}) -> "
              f"{type(e).__name__}: {e}")
        return 1

    import jax.numpy as jnp
    import numpy as np
    import optax
    import terra_tpu as tt
    from terra_tpu import optim
    from terra_tpu.ops import rng as rng_mod

    devarr = np.asarray(devs).reshape(4, 2)
    mesh = Mesh(devarr, ("rows", "samples"))
    if tex_res:
        scene = _big_tex_scene(tex_res)
        fields = ("textures", "attrs", "emissive")
        print(f"big-texture probe: res {tex_res} -> grad "
              f"{tex_res * tex_res * 3 * 4 / 1e6:.0f} MB per psum chunk")
    else:
        scene = tt.scenes.cornell_box()
        fields = ("attrs", "emissive")
    cam = tt.scenes.cornell_camera()
    opts = tt.RenderOptions(width=16, height=16, samples_per_pixel=8,
                            bounces=2, integrator=tt.Integrator.DIRECT)
    k0, k1 = rng_mod.key_from_seed(0)
    key = jnp.array([k0, k1], jnp.uint32)
    target = jnp.zeros((16, 16, 3), jnp.float32)
    optimizer = optax.adam(1e-2)
    params = optim.extract_params(scene, fields)
    state = optim.TrainState(params, optimizer.init(params), jnp.int32(0))
    step = optim.make_train_step_sharded(cam, opts, target, optimizer, mesh,
                                         grad_chunks=chunks)
    print(f"grad_chunks = {chunks}; lowering against the abstract mesh ...")

    try:
        lowered = jax.jit(step).lower(state, scene, key)
        print("lowered; invoking the TPU compiler deviceless ...")
        compiled = lowered.compile()
        hlo = compiled.as_text()
    except Exception as e:
        print("AOT COMPILE FAILED (recorded as the evidence):")
        traceback.print_exc()
        print(f"AOT-REFUSAL: lower/compile -> {type(e).__name__}: {e}")
        return 1

    lines = hlo.splitlines()
    op_lines = [ln for ln in lines if re.search(r"%?\S+ = ", ln)]
    n_ops = len(op_lines)
    starts = [i for i, ln in enumerate(op_lines) if "all-reduce-start" in ln]
    dones = [i for i, ln in enumerate(op_lines) if "all-reduce-done" in ln]
    syncs = [i for i, ln in enumerate(op_lines)
             if re.search(r"= \S* ?all-reduce\(", ln)]
    print(f"optimized TPU HLO: {n_ops} assignment lines")
    print(f"async all-reduce pairs: {len(starts)} start / {len(dones)} done; "
          f"sync all-reduce: {len(syncs)}")
    for i, s in enumerate(starts):
        d = next((dd for dd in dones if dd > s), n_ops)
        between = [ln for ln in op_lines[s + 1:d]
                   if not re.search(r"(parameter|constant|tuple|bitcast|copy|"
                                    r"get-tuple-element)\b", ln)]
        fusions = sum("fusion" in ln for ln in between)
        print(f"  pair {i}: positions {s}->{d} ({s / n_ops:.1%}..{d / n_ops:.1%}"
              f" of module), {len(between)} non-trivial ops in window"
              f" ({fusions} fusions)")
    for i in syncs:
        print(f"  sync all-reduce at {i} ({i / n_ops:.1%} of module)")
    out = "/tmp/aot_tpu_hlo.txt"
    with open(out, "w") as f:
        f.write(hlo)
    print(f"full HLO written to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
