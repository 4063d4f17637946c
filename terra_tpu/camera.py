"""Batched pinhole camera ray generation.

Replaces the per-pixel scalar camera of the reference
(terra_camera_perspective_sample, /root/reference/src/Terra.c:1783-1799 and
terra_camera_to_world_frame, Terra.c:1770-1781) with one vectorized primary
ray generation over the whole wavefront. Left-handed, Y-up, camera looks
down +Z in camera space.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .ops import math3
from .scene import Camera

__all__ = ["camera_basis", "generate_rays"]

DEG2RAD = np.float32(0.0174533)  # matches the constant at Terra.c:1794


def camera_basis(camera: Camera):
    """World-space (x, y, z) camera axes (terra_camera_to_world_frame,
    Terra.c:1770-1781): z = normalize(dir), x = normalize(up × z), y = z × x
    (left-handed)."""
    zaxis = math3.normalize(camera.direction)
    xaxis = math3.normalize(math3.cross(camera.up, zaxis))
    yaxis = math3.cross(zaxis, xaxis)
    return xaxis, yaxis, zaxis


def generate_rays(camera: Camera, width: int, height: int, px, py, jitter, r1, r2):
    """Primary rays for lane arrays of pixel coordinates.

    px, py : integer arrays — pixel column (x) and row (y)
    jitter : float — subpixel jitter amplitude (opts.subpixel_jitter)
    r1, r2 : float arrays in [0,1) — jitter randomness

    Returns (origins, directions), each (..., 3) f32, directions normalized.
    Matches terra_camera_perspective_sample (Terra.c:1783-1799): NDC with
    y-down, screen in [-1,1] y-up, frustum scaled by tan(fov/2) and aspect.
    """
    jitter = jnp.float32(jitter)
    dx = -jitter + 2.0 * r1 * jitter
    dy = -jitter + 2.0 * r2 * jitter
    ndc_x = (px.astype(jnp.float32) + 0.5 + dx) / np.float32(width)
    ndc_y = (py.astype(jnp.float32) + 0.5 + dy) / np.float32(height)
    screen_x = 2.0 * ndc_x - 1.0
    screen_y = 1.0 - 2.0 * ndc_y
    aspect = np.float32(width / height)
    tan_half_fov = jnp.tan(camera.fov_deg * DEG2RAD / 2.0)
    frustum_x = screen_x * aspect * tan_half_fov
    frustum_y = screen_y * tan_half_fov
    local = jnp.stack([frustum_x, frustum_y, jnp.ones_like(frustum_x)], axis=-1)
    local = math3.normalize(local)
    # Rotate camera->world: dir = R @ local with columns (x, y, z) axes
    # (terra_transformf3 of the row-major frame at Terra.c:559).
    xaxis, yaxis, zaxis = camera_basis(camera)
    directions = (
        local[..., 0:1] * xaxis + local[..., 1:2] * yaxis + local[..., 2:3] * zaxis
    )
    origins = jnp.broadcast_to(camera.position, directions.shape)
    return origins, directions
