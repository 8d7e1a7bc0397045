"""Convolution primitives, NHWC / HWIO — the TPU-native layout.

The reference gets all conv FLOPs from cuDNN via ``torch.nn.Conv2d`` (NCHW)
[R: every model/*.py]. Here everything is ``lax.conv_general_dilated`` in
NHWC so XLA tiles directly onto the MXU; bf16 inputs accumulate in fp32 on
the MXU automatically.

Shape semantics mirror torch's integer-padding convention exactly (the model
zoo's geometry depends on it): ``out = floor((H + 2p - d*(k-1) - 1)/s) + 1``.

Weight-porting note: torch Conv2d weights are OIHW; ours are HWIO
(``w_jax = w_torch.transpose(2, 3, 1, 0)``). torch ConvTranspose2d weights
are IOHW and must additionally be spatially flipped
(``w_jax = w_torch.flip(2, 3).transpose(2, 3, 0, 1)``) because we express
transposed conv as an lhs-dilated regular conv.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

IntOr2 = Union[int, Tuple[int, int]]


def _pair(v: IntOr2) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        assert len(v) == 2
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def conv2d(x: jnp.ndarray, kernel: jnp.ndarray, *,
           stride: IntOr2 = 1, padding: IntOr2 = 0, dilation: IntOr2 = 1,
           groups: int = 1, bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """2D convolution. x: NHWC, kernel: HWIO (I = in_channels // groups)."""
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    y = lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=(dh, dw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def _zero_insert(x: jnp.ndarray, sh: int, sw: int) -> jnp.ndarray:
    """(N,H,W,C) -> (N,H*sh,W*sw,C): each pixel followed by s-1 zero rows/cols."""
    if sh == 1 and sw == 1:
        return x
    n, h, w, c = x.shape
    y = jnp.zeros((n, h, sh, w, sw, c), x.dtype)
    y = y.at[:, :, 0, :, 0, :].set(x)
    return y.reshape(n, h * sh, w * sw, c)


def conv2d_transpose(x: jnp.ndarray, kernel: jnp.ndarray, *,
                     stride: IntOr2 = 1, padding: IntOr2 = 0,
                     output_padding: IntOr2 = 0,
                     bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Transposed conv with torch shape semantics:
    ``out = (H - 1)*s - 2p + k + output_padding``. x: NHWC, kernel: HWIO
    (I = in_channels, O = out_channels).

    Implemented as explicit zero-insertion (reshape interleave) + a stride-1
    conv rather than lax lhs_dilation: the reshape/pad/conv pipeline is
    handled exactly by XLA's SPMD partitioner under spatial sharding, where
    lhs-dilated convs with asymmetric padding miscompile (halo logic), and it
    maps onto the MXU identically after fusion.
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    oph, opw = _pair(output_padding)
    kh, kw = kernel.shape[0], kernel.shape[1]
    assert oph < sh and opw < sw, "output_padding must be < stride"
    y = _zero_insert(x, sh, sw)
    # zero-insertion appends (s-1) trailing zero rows/cols beyond the last
    # sample vs. pure lhs-dilation; fold them into the high-side padding
    pad_h = (kh - 1 - ph, kh - 1 - ph + oph - (sh - 1))
    pad_w = (kw - 1 - pw, kw - 1 - pw + opw - (sw - 1))

    def clamp(yy, axis, lo, hi):
        # negative padding = crop (rare: p > k-1 or large stride)
        if lo < 0:
            yy = lax.slice_in_dim(yy, -lo, yy.shape[axis], axis=axis)
            lo = 0
        if hi < 0:
            yy = lax.slice_in_dim(yy, 0, yy.shape[axis] + hi, axis=axis)
            hi = 0
        return yy, lo, hi

    y, lo_h, hi_h = clamp(y, 1, *pad_h)
    y, lo_w, hi_w = clamp(y, 2, *pad_w)
    y = lax.conv_general_dilated(
        y, kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding=((lo_h, hi_h), (lo_w, hi_w)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def depthwise_conv2d(x: jnp.ndarray, kernel: jnp.ndarray, *,
                     stride: IntOr2 = 1, padding: IntOr2 = 0,
                     dilation: IntOr2 = 1,
                     bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Depthwise conv: kernel HW1C (HWIO with I=1, O=C*multiplier)."""
    channels = x.shape[-1]
    return conv2d(x, kernel, stride=stride, padding=padding,
                  dilation=dilation, groups=channels, bias=bias)


def conv_output_size(size: int, k: int, s: int, p: int, d: int = 1) -> int:
    return (size + 2 * p - d * (k - 1) - 1) // s + 1
