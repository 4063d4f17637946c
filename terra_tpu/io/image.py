"""Image export/import: PNG/JPG via Pillow, HDR (Radiance .hdr) natively.

Replaces the stb_image_write-based export path of the reference
(/root/reference/satellite/src/Visualization.cpp:286-357 and the vendored
stb_image_write.h): LDR export clamps to [0,1] with an overflow warning,
HDR export writes float radiance.
"""
from __future__ import annotations

import logging
import os

import numpy as np

__all__ = ["save_image", "save_hdr", "load_image", "load_hdr", "srgb_decode"]

log = logging.getLogger("terra_tpu")


def srgb_decode(img: np.ndarray) -> np.ndarray:
    """Gamma 2.2 decode at load time (terra_texture_finalize,
    Terra.c:484-507)."""
    return np.power(np.clip(img, 0.0, 1.0), 2.2).astype(np.float32)


def save_image(path: str, img) -> None:
    """Save a float image to PNG/JPG/BMP/TGA (clamped to [0,1], 8-bit) or
    .hdr — the same format set as the reference's vendored stb_image_write
    (satellite/src/stb_image_write.h).

    Emits the reference's overflow warning when values exceed 1
    (Visualization.cpp:334-341).
    """
    img = np.asarray(img, np.float32)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".hdr":
        save_hdr(path, img)
        return
    if (img > 1.0 + 1e-6).any():
        log.warning("image contains values > 1; clamping on LDR export (%s)", path)
    from PIL import Image

    u8 = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(u8).save(path)


def save_hdr(path: str, img: np.ndarray) -> None:
    """Minimal Radiance RGBE (.hdr) writer (flat, non-RLE scanlines)."""
    img = np.asarray(img, np.float32)
    h, w, _ = img.shape
    maxc = img.max(axis=-1)
    valid = maxc > 1e-32
    exp = np.zeros((h, w), np.int32)
    mant = np.zeros((h, w), np.float32)
    m, e = np.frexp(np.maximum(maxc, 1e-32))
    exp = np.where(valid, e, 0)
    scale = np.where(valid, m * 256.0 / np.maximum(maxc, 1e-32), 0.0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(img * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(valid, exp + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())


def load_hdr(path: str) -> np.ndarray:
    """Minimal Radiance RGBE (.hdr) reader (flat and RLE scanlines)."""
    with open(path, "rb") as f:
        data = f.read()
    # header ends at the first blank line; next line is the resolution
    head_end = data.find(b"\n\n")
    if head_end < 0:
        raise ValueError("not a Radiance file")
    rest = data[head_end + 2:]
    nl = rest.find(b"\n")
    dims = rest[:nl].split()
    if dims[0] != b"-Y" or dims[2] != b"+X":
        raise ValueError(f"unsupported orientation {dims!r}")
    h, w = int(dims[1]), int(dims[3])
    payload = rest[nl + 1:]
    rgbe = np.zeros((h, w, 4), np.uint8)
    pos = 0
    for y in range(h):
        if w >= 8 and len(payload) - pos >= 4 and payload[pos] == 2 and payload[pos + 1] == 2:
            # adaptive RLE scanline
            pos += 4
            for c in range(4):
                x = 0
                while x < w:
                    count = payload[pos]
                    pos += 1
                    if count > 128:  # run
                        rgbe[y, x : x + count - 128, c] = payload[pos]
                        pos += 1
                        x += count - 128
                    else:  # literal
                        rgbe[y, x : x + count, c] = np.frombuffer(
                            payload, np.uint8, count, pos
                        )
                        pos += count
                        x += count
        else:
            row = np.frombuffer(payload, np.uint8, w * 4, pos).reshape(w, 4)
            rgbe[y] = row
            pos += w * 4
    exp = rgbe[..., 3].astype(np.int32)
    scale = np.where(exp > 0, np.ldexp(1.0, exp - 136), 0.0).astype(np.float32)
    return (rgbe[..., :3].astype(np.float32) * scale[..., None]).astype(np.float32)


def load_image(path: str, srgb: bool = True) -> np.ndarray:
    """Load an LDR/HDR image to float32 (H, W, 3); LDR optionally
    sRGB-decoded like the reference's finalize pass."""
    if os.path.splitext(path)[1].lower() == ".hdr":
        return load_hdr(path)
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"), np.float32) / 255.0
    return srgb_decode(arr) if srgb else arr
