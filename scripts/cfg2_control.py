"""Config-2 ceiling analysis (VERDICT r3 next #7): is the remaining gap
scheduling loss or shading math?

Runs the EXACT bench config-2 launch shape (512^2, 256 spp, one
persistent-lane launch, quota 256) three ways:
  ggx+mis      — the headline config (GGX walls, DIRECT_MIS)
  diffuse+mis  — same integrator/ray counts, diffuse walls (cheap shading)
  diffuse+simple — no NEE/MIS at all (pure path loop = scheduling floor)

If diffuse+mis ~= ggx+mis, the bound is NOT the GGX math; if
diffuse+simple is far faster, the MIS strategy rays/shading dominate.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402
import terra_tpu as tt  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from terra_tpu.ops import rng as rng_mod  # noqa: E402


def main():
    k0, k1 = rng_mod.key_from_seed(0)
    key = jnp.array([k0, k1], jnp.uint32)
    cases = [
        ("ggx+direct", tt.BSDFType.GGX, tt.Integrator.DIRECT, 1),
        ("ggx+simple", tt.BSDFType.GGX, tt.Integrator.SIMPLE, 0),
        ("ggx+mis", tt.BSDFType.GGX, tt.Integrator.DIRECT_MIS, 2),
    ]
    for label, wall, integ, shadow in cases:
        scene = tt.scenes.cornell_box(accelerator=tt.Accelerator.BRUTE,
                                      wall_bsdf=wall)
        cam = tt.scenes.cornell_camera()
        opts = tt.RenderOptions(
            width=512, height=512, samples_per_pixel=256, bounces=4,
            integrator=integ, subpixel_jitter=0.5,
            samples_per_launch=256, samples_per_lane=256,
        )
        mrays, dt = bench._timed_render(scene, cam, opts, key,
                                        shadow_rays_per_bounce=shadow)
        print(f"  cfg2 {label:15s}: {mrays:7.2f} Mrays/s  "
              f"({dt:.2f}s, {dt / 256 * 1e3:.1f} ms/spp)", flush=True)


if __name__ == "__main__":
    main()
