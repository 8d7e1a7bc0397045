"""Spatial resize ops (NHWC, static shapes only — XLA-friendly).

The reference upsamples logits with ``F.interpolate(..., mode='bilinear')``
or transposed convs [R: most model/*.py forward tails]. We standardize on
half-pixel-center bilinear (torch ``align_corners=False``), which is what
``jax.image.resize`` implements.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize to (H, W); matches torch align_corners=False."""
    n, h, w, c = x.shape
    oh, ow = size
    if (oh, ow) == (h, w):
        return x
    out = jax.image.resize(x, (n, oh, ow, c), method="bilinear")
    return out.astype(x.dtype)


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    n, h, w, c = x.shape
    oh, ow = size
    if (oh, ow) == (h, w):
        return x
    return jax.image.resize(x, (n, oh, ow, c), method="nearest")


def upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    return resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))

