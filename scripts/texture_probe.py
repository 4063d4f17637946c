"""Measure the LAST unmeasured gather-chain class (VERDICT r4 #7):
textures.sample's bilinear per-lane gathers, at the established
262k-lane methodology, on the real TPU.

Components timed (jit-isolated, 3 reps after warmup):
  * textures.sample, bilinear, small atlas (2 x 128^2 — the courtyard's)
  * textures.sample, bilinear, big atlas (1 x 1024^2 — Sponza-class)
  * textures.sample_latlong (the env radiance-on-miss path)
  * a FLAT-index reformulation of the same bilinear fetch (one 1D gather
    per tap into (NT*H*W, 3), per-tex metadata hoisted to one lookup) —
    the candidate fix if the 3D gather is ms-class.

Run directly on the TPU box (CLAUDE.md: one TPU process at a time).
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import terra_tpu as tt  # noqa: E402
from terra_tpu import textures as textures_mod  # noqa: E402
from terra_tpu.scene import TextureAtlas  # noqa: E402

N = 1 << 18  # 262,144 lanes (the config-2 probe methodology)


def make_atlas(nt, res):
    rng = np.random.default_rng(res)
    data = rng.random((nt, res, res, 3), np.float32)
    return TextureAtlas(
        data=jnp.asarray(data),
        size=jnp.asarray(np.full((nt, 2), res, np.int32)),
        filter=jnp.asarray(np.ones((nt,), np.int32)),      # bilinear
        address=jnp.asarray(np.zeros((nt,), np.int32)),    # wrap
    )


def timed(fn, *args, label="", reps=3):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"  {label}: {ms:.2f} ms / {N >> 10}k lanes", flush=True)
    return ms


def sample_flat(atlas, tex_id, uv):
    """Flat-index bilinear: identical texels to textures.sample for WRAP
    atlases whose textures fill the padded array (h==H, w==W): one 1D
    row gather per tap, metadata hoisted."""
    nt, H, W, _ = atlas.data.shape
    flat = atlas.data.reshape(nt * H * W, 3)
    h = atlas.size[tex_id, 0].astype(jnp.float32)
    w = atlas.size[tex_id, 1].astype(jnp.float32)
    fx = uv[..., 0] * w
    fy = uv[..., 1] * h
    ix = jnp.floor(fx).astype(jnp.int32)
    iy = jnp.floor(fy).astype(jnp.int32)
    hw = jnp.int32(H * W)
    base = tex_id * hw

    def read(x, y):
        x = jnp.remainder(x, jnp.int32(W))
        y = jnp.remainder(y, jnp.int32(H))
        return flat[base + y * jnp.int32(W) + x]

    n1 = read(ix, iy)
    n2 = read(ix + 1, iy)
    n3 = read(ix, iy + 1)
    n4 = read(ix + 1, iy + 1)
    w_u = (fx - ix.astype(jnp.float32))[..., None]
    w_v = (fy - iy.astype(jnp.float32))[..., None]
    return (n1 * (1 - w_u) + n2 * w_u) * (1 - w_v) + (
        n3 * (1 - w_u) + n4 * w_u) * w_v


def main():
    rng = np.random.default_rng(1)
    uv = jnp.asarray(rng.random((N, 2), np.float32))
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))

    for nt, res in ((2, 128), (1, 1024)):
        atlas = make_atlas(nt, res)
        tex_id = jnp.asarray(rng.integers(0, nt, N).astype(np.int32))
        print(f"atlas {nt} x {res}^2:")
        t_ref = timed(textures_mod.sample, atlas, tex_id, uv,
                      label="sample (3D gather x4)")
        t_flat = timed(sample_flat, atlas, tex_id, uv,
                       label="sample_flat (1D gather x4)")
        # equivalence (wrap, full-size textures: taps identical)
        a = jax.jit(textures_mod.sample)(atlas, tex_id, uv)
        b = jax.jit(sample_flat)(atlas, tex_id, uv)
        ok = bool(jnp.allclose(a, b, rtol=1e-6, atol=1e-6))
        print(f"  flat == ref: {ok}  speedup {t_ref / max(t_flat, 1e-9):.2f}x")
        timed(textures_mod.sample_latlong, atlas,
              jnp.zeros((N,), jnp.int32), d, label="sample_latlong")


if __name__ == "__main__":
    main()
