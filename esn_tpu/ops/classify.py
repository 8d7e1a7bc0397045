"""Prediction-head ops (class-axis argmax).

Separated from the spatial ops because the lowering is perf-critical and
centralized (every eval/predict/bench path routes through here).
"""
from __future__ import annotations

import os

import jax.numpy as jnp
from jax import lax


def _argmax_packed_bf16(x: jnp.ndarray) -> jnp.ndarray:
    """Exact bf16 argmax as ONE plain max-reduce via a packed integer key.

    Key = monotone(value bits) << 8 | (255 - class index): ordering by key
    is ordering by (value, -index), so the max key decodes to the FIRST
    maximal class — jnp.argmax's tie rule. ``x + 0`` first canonicalizes
    -0.0 to +0.0 so both zeros compare equal, as in float compare.
    """
    b = lax.bitcast_convert_type(x + jnp.asarray(0, x.dtype),
                                 jnp.uint16).astype(jnp.int32)
    key = jnp.where(b >= 0x8000, b ^ 0xFFFF, b | 0x8000)
    idx = lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    m = jnp.max((key << 8) | (255 - idx), axis=-1)
    return (255 - (m & 255)).astype(jnp.int32)


def _argmax_two_pass(x: jnp.ndarray) -> jnp.ndarray:
    """Exact argmax for any float dtype as two plain reduces:
    max, then min class index attaining it."""
    c = x.shape[-1]
    m = jnp.max(x, axis=-1, keepdims=True)
    idx = lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    # min() clamped to c-1: an all-NaN row never matches x == m, and the
    # sentinel c would be an out-of-range label for downstream scatters
    # (confusion_matrix). jnp.argmax returns 0 there; any in-range index
    # is an acceptable answer for undefined input.
    return jnp.minimum(jnp.min(jnp.where(x == m, idx, c), axis=-1),
                       c - 1).astype(jnp.int32)


def argmax_lastdim(x, tail: str = "conv"):
    """Class-axis argmax — the zoo's single prediction hook.

    Centralized because the lowering is perf-sensitive and depends on what
    PRODUCED the logits (``tail``, from the model's ``LOGITS_TAIL``):

    - ``jnp.argmax`` is a VARIADIC reduce; XLA refuses its producer into the
      reduction and recomputes it per class. After an expensive producer
      (ESPNet's transposed-conv decoder) that is catastrophic — measured
      127 ms on (8,1024,2048,19), half the inference step, vs 2.6 ms for
      the bare op (tools/bench_argmax.py, tools/bench_convt_subpixel.py).
    - But when the producer is a cheap low-res bilinear upsample
      (Fast-SCNN & friends), that same refusion is OPTIMAL: full-res logits
      never touch HBM, and recomputing an upsample per class is nearly
      free. Any single-pass reformulation loses ~15% end-to-end
      (tools/bench_argmax_variants.py: 923 vs 792 img/s on Fast-SCNN b128).

    So: ``tail="resize"`` (model ends in ``ops.resize``) keeps
    ``jnp.argmax``; ``tail="conv"`` (default — conv/deconv/unpool tails)
    avoids the variadic form with plain max-reduces:

    - bf16: one max over a packed (value bits, reversed index) integer key —
      single pass, bit-exact incl. first-max tie rule (NaN keys sort above
      +inf, roughly matching argmax-on-NaN behavior).
    - other floats: max + masked min-index — two passes, exact for all
      dtypes.

    ``ESN_TPU_ARGMAX=naive`` forces ``jnp.argmax`` everywhere.
    """
    if os.environ.get("ESN_TPU_ARGMAX", "auto") == "naive" \
            or tail == "resize" or x.shape[-1] > 256:
        return jnp.argmax(x, axis=-1).astype(jnp.int32)
    if x.dtype == jnp.bfloat16:
        return _argmax_packed_bf16(x)
    return _argmax_two_pass(x)


def subpixel_argmax(x, kernel, bias, *, stride, padding,
                    argmax_tail: str = "conv"):
    """Fused prediction head for a final ConvTranspose: class-argmax per
    subpixel phase at LOW res, then depth-to-space the int32 indices.

    ``argmax(depth_to_space(z)) == depth_to_space(argmax per phase)`` —
    depth-to-space only permutes pixels — so this is exact, but the
    full-resolution class-channel logits never exist: the only full-res
    tensor is the int32 prediction map. (ESPNet b8: 64.4 vs 36.5 img/s,
    tools/bench_convt_subpixel.py variant E.)

    x: (N,H,W,I) features; kernel/bias: the ConvTranspose's parameters.
    """
    from .convolution import subpixel_phase_conv
    sh, sw = stride
    z = subpixel_phase_conv(x, kernel, stride=stride, padding=padding)
    n, h, w, c = z.shape
    o = c // (sh * sw)
    z = z.reshape(n, h, w, sh * sw, o)
    if bias is not None:
        z = z + bias.astype(z.dtype)
    idx = argmax_lastdim(z, tail=argmax_tail)     # (n,h,w,sh*sw)
    idx = idx.reshape(n, h, w, sh, sw).transpose(0, 1, 3, 2, 4)
    return idx.reshape(n, h * sh, w * sw)
