"""Inverse rendering demo (BASELINE config 4): recover albedo, roughness
and emission of the Cornell box from a rendered target via pixel-loss
gradients.

    python scripts/inverse_render.py [--steps 200] [--sharded]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--size", type=int, default=32)
    p.add_argument("--spp", type=int, default=8)
    p.add_argument("--lr", type=float, default=3e-2)
    p.add_argument("--sharded", action="store_true", help="use the device mesh")
    p.add_argument("--cpu-mesh", action="store_true")
    args = p.parse_args()

    if args.cpu_mesh:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    import terra_tpu as tt
    from terra_tpu import optim
    from terra_tpu.ops import rng as rng_mod
    from terra_tpu.parallel.mesh import make_mesh

    # ground truth scene and target image
    scene_gt = tt.scenes.cornell_box(with_blocks=False)
    cam = tt.scenes.cornell_camera()
    opts = tt.RenderOptions(
        width=args.size, height=args.size, samples_per_pixel=args.spp,
        bounces=2, integrator=tt.Integrator.DIRECT, rr_start_bounce=8,
    )
    k0, k1 = rng_mod.key_from_seed(7)
    key = jnp.array([k0, k1], jnp.uint32)
    target = optim.render_mean_image(scene_gt, cam, opts, key, jnp.int32(0), args.spp)
    target = jax.lax.stop_gradient(target)

    # perturb: wrong wall albedo + wrong emission
    attrs0 = scene_gt.materials.attrs.at[0, 0, :].set(jnp.asarray([0.3, 0.5, 0.6]))
    em0 = scene_gt.materials.emissive.at[3, :].set(jnp.asarray([5.0, 5.0, 5.0]))
    import dataclasses

    scene0 = dataclasses.replace(
        scene_gt,
        materials=dataclasses.replace(scene_gt.materials, attrs=attrs0, emissive=em0),
    )

    mesh = make_mesh() if args.sharded else None
    t0 = time.perf_counter()
    recovered, losses = optim.recover(
        scene0, cam, opts, target, fields=("attrs", "emissive"),
        steps=args.steps, learning_rate=args.lr, seed=7, mesh=mesh,
        log_every=max(args.steps // 10, 1),
    )
    dt = time.perf_counter() - t0

    alb = np.asarray(recovered.materials.attrs)[0, 0]
    em = np.asarray(recovered.materials.emissive)[3]
    print(f"\n{args.steps} steps in {dt:.1f}s ({dt / args.steps * 1e3:.0f} ms/step)")
    print(f"loss: {losses[0]:.5f} -> {losses[-1]:.5f}")
    print(f"recovered wall albedo {alb.round(3)}  (truth [0.73 0.73 0.73])")
    print(f"recovered emission    {em.round(2)}  (truth [15 15 15])")
    ok = abs(alb - 0.73).max() < 0.12 and abs(em - 15).max() < 3.0
    print("RECOVERED" if ok else "NOT CONVERGED (try more steps)")


if __name__ == "__main__":
    main()
