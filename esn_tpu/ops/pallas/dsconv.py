"""Fused depthwise-separable convolution — the flagship Pallas TPU kernel.

Reference counterpart: ``_DSConv`` in FastSCNN/ContextNet [R: model/FastSCNN.py,
model/ContextNet.py] — ``dw 3x3 -> BN -> ReLU -> pw 1x1 -> BN -> ReLU`` — which
under torch runs as two cuDNN convs plus four elementwise kernels, with the
intermediate activation making two extra HBM round-trips.

TPU-first design: at inference the BNs are pure per-channel affines, so the
whole block collapses into ONE kernel pass:

  HBM row-tile (halo included) --pipeline--> VMEM --VPU 9-tap dwconv +
  affine + act--> --MXU (TH*W, Cin)@(Cin, Cout) pointwise + affine + act-->
  VMEM out --> HBM

i.e. a single HBM read of ``x`` and a single write of the output; the dwconv
intermediate never leaves VMEM. At the zoo's high-resolution stages
(2048x1024xC, C in 32..128) the op is bandwidth-bound, so eliminating the
intermediate round-trip approaches a 2x speed-of-light win over the unfused
sequence.

Implementation notes (all load-bearing):

- **Halos via Element indexing.** Input blocks use all-``Element`` BlockSpecs
  so consecutive row-tiles may overlap by the one-row conv halo; the Pallas
  pipeline double-buffers the HBM->VMEM transfers. (Manual ``make_async_copy``
  from an HBM ref fails in this Mosaic version unless the lane dim is a
  multiple of 128 — zoo channel counts are 32/48/64/96 — so Element indexing
  is required, not a style choice.)
- **Boundaries via clamp + in-VMEM zero-pad.** The window start is clamped to
  [0, H - TH_in]; the kernel zero-pads the tile by (2, 2)x(1, 1) in VMEM and
  re-offsets, which maps every out-of-range global row/col of a SAME conv
  exactly onto a zero pad row/col — no masks, and crucially no padded copy of
  ``x`` in HBM (that copy would cost a full extra read+write of ``x`` and
  erase the fusion win).
- **Stride 2 without strided slicing** (unsupported sublane stride): slice an
  even-length window and drop odd rows/cols with a reshape.

Training support: :func:`fused_dsconv` carries a ``jax.custom_vjp`` whose
backward differentiates the XLA reference implementation — the fused forward
equals the reference at eval-time BN semantics, so gradients are exact.

Everything here has an XLA fallback (``impl='xla'``) and a CPU interpreter
path (``impl='interpret'``) pinned by parity tests in ``tests/test_pallas.py``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:  # not yet re-exported under jax.experimental.pallas in this version
    Element = pl.Element  # type: ignore[attr-defined]
except AttributeError:
    from jax._src.pallas.core import Element

from .. import convolution as C

_ACTS = {
    "none": lambda x: x,
    "relu": lambda x: jnp.maximum(x, 0),
    "relu6": lambda x: jnp.clip(x, 0, 6),
}

# Per-step VMEM working-set budget. v5e has ~16MB/core; the input block is
# double-buffered by the pipeline and the kernel makes one padded copy.
_VMEM_BUDGET = 6 * 1024 * 1024


def _pad128(c: int) -> int:
    return -(-c // 128) * 128


def _pick_tile(h_out: int, stride: int, w: int, w_out: int, c_in: int,
               c_out: int, itemsize: int, max_th_in: int):
    """Largest divisor TH of h_out whose VMEM working set fits the budget
    and whose input window (th_in rows) fits inside the image."""
    ci, co = _pad128(c_in), _pad128(c_out)
    best = None
    for th in range(1, h_out + 1):
        if h_out % th:
            continue
        th_in = (th - 1) * stride + 3
        if th_in > max_th_in:  # window taller than the image; grows with th
            break
        need = (
            2 * th_in * w * ci * itemsize          # double-buffered input block
            + (th_in + 4) * (w + 2) * ci * itemsize  # in-VMEM padded copy
            + th * w_out * ci * 4                  # f32 dwconv accumulator
            + 2 * th * w_out * co * itemsize       # double-buffered output
        )
        if need <= _VMEM_BUDGET:
            best = (th, th_in)
        else:
            break
    return best


def dsconv_ref(x, dw, a1, b1, pw, a2, b2, *, stride=1,
               act1="relu", act2="relu"):
    """XLA reference: dw 3x3 + affine + act, then pw 1x1 + affine + act.

    ``dw``: (3, 3, Cin); ``pw``: (Cin, Cout); a/b: folded per-channel
    BN scale/offset (see ``fold_bn``).
    """
    f1, f2 = _ACTS[act1], _ACTS[act2]
    h = C.depthwise_conv2d(x, dw[:, :, None, :], stride=stride, padding=1)
    h = f1(h.astype(jnp.float32) * a1 + b1)
    y = jnp.einsum("nhwc,cd->nhwd", h, pw.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    return f2(y * a2 + b2).astype(x.dtype)


def _kernel(x_ref, dw_ref, a1_ref, b1_ref, pw_ref, a2_ref, b2_ref, out_ref,
            *, th: int, th_in: int, stride: int, h: int, w_out: int,
            act1: str, act2: str):
    s = stride
    t = pl.program_id(1)
    start = jnp.clip(t * th * s - 1, 0, h - th_in)
    # local offset of the conceptual (unclamped) window inside the padded
    # tile; provably in {-1, 0, +1} (first tile / interior / last tile), so
    # the tap extraction is a 3-way switch over STATIC slices (Mosaic has no
    # dynamic_slice lowering for values).
    off = t * th * s - 1 - start

    xv = x_ref[0]                                     # (th_in, W, Cin)
    c_in = xv.shape[-1]
    w = xv.shape[1]
    # zero-pad in VMEM: rows by 2 (covers clamp shift in [-1, +1] plus the
    # conv halo), cols by 1 (the SAME halo; +1 right for odd W under stride 2
    # so the even/odd-reshape slice of length 2*w_out stays in bounds) —
    # exact conv boundary semantics (extra pad cols are never selected)
    ew = max(0, 2 * w_out - w) if s == 2 else 0
    xp = jnp.pad(xv, ((2, 2), (1, 1 + ew), (0, 0)))

    def taps(row0):
        def go(xp):
            acc = jnp.zeros((th, w_out, c_in), jnp.float32)
            for di in range(3):
                for dj in range(3):
                    r = row0 + di
                    if s == 1:
                        tap = xp[r:r + th, dj:dj + w_out]
                    else:
                        win = xp[r:r + 2 * th, dj:dj + 2 * w_out]
                        tap = win.reshape(th, 2, 2 * w_out, c_in)[:, 0] \
                            .reshape(th, w_out, 2, c_in)[:, :, 0]
                    acc = acc + tap.astype(jnp.float32) \
                        * dw_ref[di, dj, :].astype(jnp.float32)
            return acc
        return go

    acc = lax.switch(off + 1, [taps(1), taps(2), taps(3)], xp)

    hmid = _ACTS[act1](acc * a1_ref[:].astype(jnp.float32)
                       + b1_ref[:].astype(jnp.float32))

    c_out = pw_ref.shape[-1]
    y = jnp.dot(hmid.reshape(th * w_out, c_in).astype(xv.dtype),
                pw_ref[:], preferred_element_type=jnp.float32)
    y = _ACTS[act2](y * a2_ref[:].astype(jnp.float32)
                    + b2_ref[:].astype(jnp.float32))
    out_ref[0] = y.reshape(th, w_out, c_out).astype(out_ref.dtype)


def _dsconv_pallas(x, dw, a1, b1, pw, a2, b2, *, stride, act1, act2,
                   interpret=False):
    n, h, w, c_in = x.shape
    c_out = pw.shape[-1]
    h_out = C.conv_output_size(h, 3, stride, 1)
    w_out = C.conv_output_size(w, 3, stride, 1)

    isize = jnp.dtype(x.dtype).itemsize
    # Compiled path needs real-model-sized maps: on small H/W this XLA build
    # spills whole buffers into scoped VMEM around the custom call and OOMs
    # (verified: 65x129/129x257 fail, 513x1025+ are exact). Interpret mode
    # has no such limit — parity tests exercise small shapes through it.
    if not interpret and (h < 192 or w < 384):
        return dsconv_ref(x, dw, a1, b1, pw, a2, b2, stride=stride,
                          act1=act1, act2=act2)
    pick = _pick_tile(h_out, stride, w, w_out, c_in, c_out, isize, max_th_in=h)
    if pick is None:  # no tile both fits VMEM and keeps its window inside H
        return dsconv_ref(x, dw, a1, b1, pw, a2, b2, stride=stride,
                          act1=act1, act2=act2)
    th, th_in = pick

    kern = functools.partial(_kernel, th=th, th_in=th_in, stride=stride,
                             h=h, w_out=w_out, act1=act1, act2=act2)
    flops = n * h_out * w_out * (9 * c_in * 2 + 2 * c_in * c_out)
    bytes_acc = (x.size + n * h_out * w_out * c_out) * isize \
        + (dw.size + a1.size + b1.size + a2.size + b2.size) * 4 \
        + pw.size * isize
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    s = stride
    return pl.pallas_call(
        kern,
        grid=(n, h_out // th),
        in_specs=[
            pl.BlockSpec(
                (Element(1), Element(th_in), Element(w), Element(c_in)),
                lambda n_, t_: (n_, jnp.clip(t_ * th * s - 1, 0, h - th_in),
                                0, 0),
                memory_space=pltpu.VMEM),
            vec, vec, vec, vec, vec, vec,    # dw, a1, b1, pw, a2, b2
        ],
        out_specs=pl.BlockSpec((1, th, w_out, c_out),
                               lambda n_, t_: (n_, t_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h_out, w_out, c_out), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(_VMEM_BUDGET * 2.5)),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bytes_acc,
                                      transcendentals=0),
        interpret=interpret,
    )(x, dw, a1, b1, pw.astype(x.dtype), a2, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _fused_dsconv(x, dw, a1, b1, pw, a2, b2, stride, act1, act2, interpret):
    return _dsconv_pallas(x, dw, a1, b1, pw, a2, b2, stride=stride,
                          act1=act1, act2=act2, interpret=interpret)


def _fwd(x, dw, a1, b1, pw, a2, b2, stride, act1, act2, interpret):
    y = _fused_dsconv(x, dw, a1, b1, pw, a2, b2, stride, act1, act2, interpret)
    return y, (x, dw, a1, b1, pw, a2, b2)


def _bwd(stride, act1, act2, interpret, res, g):
    x, dw, a1, b1, pw, a2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: dsconv_ref(*a, stride=stride, act1=act1, act2=act2),
        x, dw, a1, b1, pw, a2, b2)
    return vjp(g)


_fused_dsconv.defvjp(_fwd, _bwd)


def fused_dsconv(x, dw, a1, b1, pw, a2, b2, *, stride: int = 1,
                 act1: str = "relu", act2: str = "relu",
                 impl: str = "auto") -> jnp.ndarray:
    """Single-pass depthwise-separable conv with folded BN affines.

    Args:
      x: (N, H, W, Cin) input, fp32 or bf16.
      dw: (3, 3, Cin) depthwise taps.  a1/b1: (Cin,) post-dw affine.
      pw: (Cin, Cout) pointwise weights.  a2/b2: (Cout,) post-pw affine.
      stride: 1 or 2 (SAME padding, torch output-size semantics).
      act1/act2: 'relu' | 'relu6' | 'none'.
      impl: 'auto' (Pallas on TPU, XLA elsewhere), 'pallas', 'xla',
        or 'interpret' (Pallas interpreter — tests only).
    """
    assert stride in (1, 2) and dw.shape[:2] == (3, 3)
    if impl == "auto":
        # Measured on v5e (tools/bench_dsconv.py, slope-timed): XLA already
        # fuses the eval-path dsconv chain well; the Pallas kernel wins only
        # for fp32 stride-1 at >=64 lanes (~1.15x). Engage exactly there.
        wins = (jax.default_backend() == "tpu" and stride == 1
                and x.dtype == jnp.float32 and x.shape[-1] >= 64)
        impl = "pallas" if wins else "xla"
    if impl == "xla":
        return dsconv_ref(x, dw, a1, b1, pw, a2, b2, stride=stride,
                          act1=act1, act2=act2)
    return _fused_dsconv(x, dw, a1, b1, pw, a2, b2, stride, act1, act2,
                         impl == "interpret")


def fold_bn(mean, var, gamma, beta, eps: float = 1e-5):
    """BN running stats -> (scale, offset) so ``y = x*scale + offset``."""
    scale = gamma * jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    return scale, beta - mean * scale
