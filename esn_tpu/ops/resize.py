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


def argmax_lastdim(x):
    """Class-axis argmax — the zoo's single prediction hook.

    Centralized because the lowering is perf-sensitive: XLA can fuse the
    argmax's PRODUCER into the variadic reduce and recompute it per class
    (measured 127 ms on (8,1024,2048,19) after an ESPNet decoder — half the
    inference step — vs 2.6 ms for the bare op; tools/bench_argmax.py and
    tools/profile_infer.py). An ``optimization_barrier`` fence fixes ESPNet
    (+10%) but forfeits the upsample+argmax fusion that makes Fast-SCNN
    fastest (-5%), so the default stays plain ``jnp.argmax``; revisit with a
    producer-cost-aware fence if the ESP family becomes the headline.
    """
    import jax.numpy as jnp
    return jnp.argmax(x, axis=-1).astype(jnp.int32)
