"""Film: progressive accumulation buffers + tonemapping post-pass.

Replaces TerraFramebuffer (/root/reference/include/Terra.h:183-193) and the
per-pixel exposure/tonemap tail of terra_render (Terra.c:569-630). The accum
plane (`acc`, `samples`) is the resume mechanism exactly as in the reference:
the displayed image is always acc/samples, so renders can be stopped,
checkpointed and continued (SURVEY.md §5).

Tonemapping is a pure jnp post-pass over the whole image; it is outside the
gradient path by default (losses are computed on the linear accumulator).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from .scene import Tonemap

__all__ = ["Film", "tonemap", "develop"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["acc", "samples"],
    meta_fields=[],
)
@dataclass
class Film:
    """acc: (H, W, 3) f32 radiance sum; samples: (H, W) i32 sample counts."""

    acc: jax.Array
    samples: jax.Array

    @staticmethod
    def create(width: int, height: int) -> "Film":
        return Film(
            acc=jnp.zeros((height, width, 3), jnp.float32),
            samples=jnp.zeros((height, width), jnp.int32),
        )

    def clear(self) -> "Film":
        return Film(acc=jnp.zeros_like(self.acc), samples=jnp.zeros_like(self.samples))

    def mean(self) -> jax.Array:
        """Progressive estimate acc/samples (Terra.c:574)."""
        n = jnp.maximum(self.samples, 1).astype(jnp.float32)[..., None]
        return self.acc / n


def _uncharted2_curve(x):
    """terra_tonemapping_uncharted2 (Terra.c:1815-1828)."""
    A, B, C, D, E, F = 0.15, 0.5, 0.1, 0.2, 0.02, 0.3
    return ((x * (A * x + C * B) + D * E) / (x * (A * x + B) + D * F)) - E / F


def tonemap(color, operator: Tonemap, exposure: float = 1.0, gamma: float = 2.2):
    """Exposure + tonemap operator (Terra.c:573-627). ``color`` is linear
    (..., 3). NOTE: the reference's filmic operator writes the blue channel
    into .x (Terra.c:604, a bug); we write it to .z (documented deviation)."""
    color = color * jnp.float32(exposure)
    inv_gamma = jnp.float32(1.0 / gamma)
    if operator == Tonemap.NONE:
        return color
    if operator == Tonemap.LINEAR:
        return jnp.power(jnp.maximum(color, 0.0), inv_gamma)
    if operator == Tonemap.REINHARD:
        c = color / (1.0 + color)
        return jnp.power(jnp.maximum(c, 0.0), inv_gamma)
    if operator == Tonemap.FILMIC:
        x = jnp.maximum(0.0, color - 0.004)
        # gamma 2.2 is folded into the curve (Terra.c:605)
        return (x * (6.2 * x + 0.5)) / (x * (6.2 * x + 1.7) + 0.06)
    if operator == Tonemap.UNCHARTED2:
        linear_white = jnp.float32(11.2)
        white_scale = 1.0 / _uncharted2_curve(linear_white)
        exposure_bias = jnp.float32(2.0)
        c = _uncharted2_curve(color * exposure_bias) * white_scale
        return jnp.power(jnp.maximum(c, 0.0), inv_gamma)
    raise ValueError(f"unknown tonemap operator: {operator}")


def develop(film: Film, operator: Tonemap = Tonemap.NONE, exposure: float = 1.0, gamma: float = 2.2):
    """Film -> display image (the pixels plane of the reference
    framebuffer): mean, exposure, tonemap."""
    return tonemap(film.mean(), operator, exposure, gamma)
