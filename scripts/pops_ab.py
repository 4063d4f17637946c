"""A/B pops_per_iter (1 vs 2) across the workload spectrum (VERDICT r4 #4
"two stack pops per scalar iteration to cut the serial fraction").

Workloads: mega-1M primary (dir3), courtyard primary (dir3), courtyard
incoherent (octant; the pop-bound regime), courtyard first-bounce cosine
(parent-hit sort unavailable here — octant; close to config 3s).

Run directly on the TPU box.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import terra_tpu as tt  # noqa: E402
from terra_tpu import camera as camera_mod  # noqa: E402
from terra_tpu.accel import pallas_traverse as pt  # noqa: E402
from terra_tpu.accel import traverse as xla_traverse  # noqa: E402
from terra_tpu.intersect import T_FAR  # noqa: E402


def host_scene(**kw):
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        scene = tt.scenes.courtyard(**kw)
    scene = jax.device_put(scene, jax.devices()[0])
    jax.block_until_ready(scene.bvh.node_min)
    return scene


def rays_primary(cam, n=1 << 20):
    side = int(np.sqrt(n))
    px, py = jnp.meshgrid(jnp.arange(side), jnp.arange(side))
    px = px.reshape(-1).astype(jnp.float32)
    py = py.reshape(-1).astype(jnp.float32)
    zeros = jnp.zeros_like(px)
    return camera_mod.generate_rays(cam, side, side, px, py, 0.0, zeros, zeros)


def rays_incoherent(scene, n=1 << 20, seed=11):
    rng = np.random.default_rng(seed)
    lo = np.asarray(scene.bvh.node_min[0])
    hi = np.asarray(scene.bvh.node_max[0])
    o = jnp.asarray(lo + rng.random((n, 3), np.float32) * (hi - lo))
    v = rng.normal(size=(n, 3)).astype(np.float32)
    return o, jnp.asarray(v / np.linalg.norm(v, axis=1, keepdims=True))


def rays_bounce(scene, cam, n=1 << 20):
    from terra_tpu import intersect as im
    from terra_tpu.surface import build_shade_tables, surface_init
    from terra_tpu.ops import math3
    o, d = rays_primary(cam, n)
    packed = pt.pack_tables_auto(scene.bvh, *scene.geometry.corners())
    hit0 = pt.raycast(scene, o, d, packed=packed)
    tables = build_shade_tables(scene)
    surf = jax.jit(lambda: surface_init(
        scene, tables, o + d * im.RAY_OFFSET_DIR, d, hit0.tri))()
    rb = np.random.default_rng(12)
    e1 = jnp.asarray(rb.random(n, np.float32))
    e2 = jnp.asarray(rb.random(n, np.float32))
    st = jnp.sqrt(jnp.maximum(1.0 - e1, 0.0))
    phi = np.float32(2.0 * np.pi) * e2
    nrm = surf.normal
    t_ax = math3.normalize(jnp.cross(nrm, jnp.asarray([0.12, 0.98, 0.17])))
    b_ax = jnp.cross(nrm, t_ax)
    d_s = math3.normalize(
        (st * jnp.cos(phi))[:, None] * t_ax + (st * jnp.sin(phi))[:, None] * b_ax
        + jnp.sqrt(e1)[:, None] * nrm)
    return surf.point + nrm * np.float32(1e-4), d_s, hit0.tri


def run_one(scene, packed, o, d, ppi, label, sort_mode="dir3", hint=None,
            reps=3):
    bvh = scene.bvh
    mode = pt.wide_mode(bvh)
    leaf_of = xla_traverse.leaf_of_tri_table(bvh) if hint is not None else None

    def run(packed, o, d, hint=None):
        if hint is not None:
            keys = xla_traverse.hinted_keys(leaf_of, hint, d)
        else:
            keys = xla_traverse._sort_keys(o, d, bvh.node_min[0],
                                           bvh.node_max[0], mode=sort_mode)
        order = jnp.argsort(keys)
        bt, bi = pt.traverse_packed(bvh, packed, o[order], d[order],
                                    mode=mode, pops_per_iter=ppi)
        return bt, bi, order

    run_j = jax.jit(run)
    t0 = time.perf_counter()
    out = run_j(packed, o, d, hint)
    jax.block_until_ready(out[0])
    compile_s = time.perf_counter() - t0
    idx = np.asarray(out[2][:2048])
    ref = xla_traverse.raycast(scene, o[idx], d[idx])
    hk = np.asarray(out[0][:2048]) < T_FAR
    assert (hk == np.asarray(ref.hit)).all(), f"{label}: GATE FAIL"
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run_j(packed, o, d, hint)
    jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t0) / reps
    n = o.shape[0]
    print(f"  {label}: {n / dt / 1e6:.2f} Mrays/s ({dt * 1e3:.1f} ms) "
          f"[compile {compile_s:.0f}s]", flush=True)


def main():
    ppis = [int(x) for x in (sys.argv[1].split(",") if len(sys.argv) > 1
                             else ["1", "2"])]
    cam = tt.scenes.courtyard_camera()

    t0 = time.perf_counter()
    mega = host_scene(grid=690, columns=40)
    print(f"mega built {time.perf_counter() - t0:.0f}s "
          f"(leaf {mega.bvh.leaf_size}, wide {mega.bvh.num_wide}, "
          f"mode {pt.wide_mode(mega.bvh)})", flush=True)
    o, d = rays_primary(cam)
    packed = pt.pack_tables_auto(mega.bvh, *mega.geometry.corners())
    for ppi in ppis:
        run_one(mega, packed, o, d, ppi, f"mega primary ppi={ppi}")

    t0 = time.perf_counter()
    cy = host_scene()
    print(f"courtyard built {time.perf_counter() - t0:.0f}s "
          f"(leaf {cy.bvh.leaf_size}, wide {cy.bvh.num_wide})", flush=True)
    oc, dc = rays_primary(cam)
    packed_c = pt.pack_tables_auto(cy.bvh, *cy.geometry.corners())
    for ppi in ppis:
        run_one(cy, packed_c, oc, dc, ppi, f"courtyard primary ppi={ppi}")
    oi, di = rays_incoherent(cy)
    for ppi in ppis:
        run_one(cy, packed_c, oi, di, ppi, f"courtyard incoh ppi={ppi}",
                sort_mode="octant")
    ob, db, hint = rays_bounce(cy, cam)
    for ppi in ppis:
        run_one(cy, packed_c, ob, db, ppi, f"courtyard bounce ppi={ppi}",
                sort_mode="octant", hint=hint)


if __name__ == "__main__":
    main()
