"""Fused bilinear-upsample + class-argmax prediction tail (Pallas).

Nine zoo models end ``__call__`` with the same tail (reference: every
model/*.py whose forward finishes in ``F.interpolate(mode='bilinear')``
[R]): logits at 1/r resolution -> f32 bilinear x r -> cast back -> argmax.
The XLA lowering of that tail fuses the upsample INTO the variadic argmax
reduce — full-res logits never hit HBM, but the reduce recomputes the
2-tap interpolation per class with the 19-class axis in lanes (6.7x lane
padding) and measured 53.7 ms of Fast-SCNN's 151 ms b128 predict step
(iota_reduce_fusion; tools/bench_resize_argmax.py).

This kernel computes the interpolation ONCE per subpixel phase with the
W axis in lanes (dense), runs a first-max compare chain over classes, and
writes only int32 indices: the only full-res tensor that ever exists is
the prediction map. Phases are emitted phase-major; a single XLA
depth-to-space transpose outside the kernel interleaves them (argmax
commutes with the pixel permutation, cf. ops.classify.subpixel_argmax).

Semantics: ``argmax(resize_bilinear(y.astype(f32), (r*h, r*w))
.astype(y.dtype), axis=-1)`` with jnp.argmax's first-max tie rule.
Half-pixel centers (torch align_corners=False): output pixel r*i+p reads
source coordinate i + (p+0.5)/r - 0.5, a 2-tap convex combination; at the
image border the out-of-range tap clamps (identical to jax.image.resize's
kernel renormalization for the 2-tap case). Same math as the unfused tail
up to f32 re-association of the separable interpolation — after the cast
back to bf16, argmax can differ at near-tie pixels (both are valid
roundings; parity-rate-tested in tests/test_pallas_resize_argmax.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def resize_argmax_ref(y: jnp.ndarray, factor: int) -> jnp.ndarray:
    """XLA reference: the exact tail the models ship unfused."""
    n, h, w, c = y.shape
    out = jax.image.resize(y.astype(jnp.float32),
                           (n, h * factor, w * factor, c), method="bilinear")
    return jnp.argmax(out.astype(y.dtype), axis=-1).astype(jnp.int32)


def _fracs(r: int):
    """Per-phase (tap offset selector, fraction on the upper tap)."""
    out = []
    for p in range(r):
        d = (p + 0.5) / r - 0.5
        if d < 0:            # taps (i-1, i), weight on i is 1+d
            out.append((0, 1.0 + d))
        else:                # taps (i, i+1), weight on i+1 is d
            out.append((1, d))
    return out


def _kernel(y_ref, out_ref, *, r: int, rb: int, c: int, val_dtype):
    """y_ref: (1, C, h+8) row-clamp-padded logits; out_ref:
    (1, r, r, rb, w) int32 phase-major indices for rb input rows."""
    blk = pl.program_id(1)
    r0 = blk * rb                       # multiple of 8: aligned sublane load
    w = y_ref.shape[3]
    # one aligned load of rb+8 rows; the three +0/+1/+2 row shifts are
    # static value slices (Mosaic forbids unaligned dynamic ref offsets)
    rows = y_ref[0, :, pl.ds(r0, rb + 8), :].astype(jnp.float32)
    shifted = [rows[:, s:s + rb] for s in range(3)]
    lane = lax.broadcasted_iota(jnp.int32, (c, rb, w), 2)
    fr = _fracs(r)
    for p in range(r):
        off, f = fr[p]
        lo, hi = shifted[off], shifted[off + 1]
        v = lo + f * (hi - lo)                           # (C, rb, w) f32
        # column neighbors with edge clamp: roll is circular, so pin the
        # wrapped column back to the edge value
        vm1 = jnp.where(lane == 0, v, pltpu.roll(v, 1, axis=2))
        vp1 = jnp.where(lane == w - 1, v, pltpu.roll(v, w - 1, axis=2))
        # shared per-pair differences: each horizontal phase is one FMA
        dm, dp = v - vm1, vp1 - v
        for q in range(r):
            qoff, g = fr[q]
            hq = (vm1 + g * dm) if qoff == 0 else (v + g * dp)
            # first-max compare chain over classes (jnp.argmax tie rule)
            # on the f32 interpolation — the torch reference argmaxes f32
            # logits too [R]; the unfused XLA tail rounds to the model
            # dtype first, so near-tie pixels can differ (rate-tested)
            best = hq[0]
            idx = jnp.zeros((rb, w), jnp.int32)
            for cc in range(1, c):
                m = hq[cc] > best
                best = jnp.where(m, hq[cc], best)
                idx = jnp.where(m, cc, idx)
            out_ref[0, p, q, :, :] = idx


def _pick_rb(h: int) -> int:
    for rb in (32, 16, 8, 4, 2, 1):
        if h % rb == 0:
            return rb
    return 1


@partial(jax.jit, static_argnames=("factor", "interpret"))
def resize_argmax(y: jnp.ndarray, factor: int,
                  interpret: bool = False) -> jnp.ndarray:
    """Fused ``argmax(upsample_bilinear_rx(y))`` -> (B, r*h, r*w) int32.

    y: (B, h, w, C) float logits at low resolution. Gradient-free
    (prediction only). Caller gates eligibility via
    ``ops.classify.fused_resize_argmax``.
    """
    n, h, w, c = y.shape
    r = int(factor)
    # class-major, W-in-lanes layout + row clamp padding (tiny: the whole
    # tensor is ~1.3 MB/img at zoo shapes). Bottom pads 7 rows so the
    # kernel's aligned (rb+8)-row loads never run off the buffer.
    t = jnp.transpose(y, (0, 3, 1, 2))                   # (B, C, h, w)
    t = jnp.concatenate([t[:, :, :1], t] + [t[:, :, -1:]] * 7, axis=2)
    rb = _pick_rb(h)
    grid = (n, h // rb)
    out = pl.pallas_call(
        partial(_kernel, r=r, rb=rb, c=c, val_dtype=y.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((1, c, h + 8, w), lambda b, i: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, r, r, rb, w),
                               lambda b, i: (b, 0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, r, r, h, w), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=n * h * w * c * r * r * 6,
            bytes_accessed=n * c * h * w * y.dtype.itemsize
            + n * r * r * h * w * 4,
            transcendentals=0),
        interpret=interpret,
    )(t)
    # depth-to-space: (B, r, r, h, w) -> (B, h*r, w*r)
    out = jnp.transpose(out, (0, 3, 1, 4, 2))
    return out.reshape(n, h * r, w * r)
