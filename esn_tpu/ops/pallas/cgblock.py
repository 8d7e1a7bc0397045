"""Fused CGNet context-guided block — Pallas TPU kernel.

Reference counterpart: ``ContextGuidedBlock`` [R: model/CGNet.py] =
``1x1 reduce (BN+PReLU) -> {dw 3x3 local || dw 3x3 dilated surround} ->
concat -> BN+PReLU -> FGlo channel gate -> residual add``. Under XLA this
is three separate convs plus elementwise chains: the reduced activation
and both context maps each make a full HBM round trip, and at CGNet's
resolutions the block is purely bandwidth-bound (stage3 blocks measured
2.5 ms at (16,128,256,128) b16 2048x1024 vs a ~0.9 ms traffic bound).

Fused design — everything between x and the pre-gate activation j runs in
ONE pass over row tiles:

  HBM x row-tile (halo d) --pipeline--> VMEM
    --MXU (TH_in*W, C)@(C, C/2) 1x1 reduce + affine + PReLU-->
    --VPU 9-tap dw (loc) + 9-tap dilated dw (sur) + affine + PReLU-->
  j tile -> HBM,  per-tile GAP partials -> HBM (f32)

The FGlo gate needs a global mean of j, so the block is two device ops:
the fused kernel above, then one fused XLA elementwise
``x + j * sigmoid(fc2(relu(fc1(mean))))`` (gate FCs are microscopic).
HBM traffic: read x + write j + read (x, j) + write out = ~5 tensor
passes vs ~9+ unfused, with the reduce/loc/sur intermediates never
leaving VMEM.

Same conventions as dsconv.py (that file has the rationale): Element
BlockSpecs for halo overlap, clamp + in-VMEM zero-pad for boundaries
(the y pad must be zeros AFTER the affine — SAME conv pads the reduced
activation, not x — so y is computed on real rows only and placed into a
zeroed buffer), 3-way static-slice switch over the clamp shift, XLA
reference backward via custom_vjp (exact at eval BN semantics), and an
``impl='auto'`` gate that engages only where measured faster.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:
    Element = pl.Element  # type: ignore[attr-defined]
except AttributeError:
    from jax._src.pallas.core import Element

from .. import convolution as C

_VMEM_BUDGET = 8 * 1024 * 1024


def _pad128(c: int) -> int:
    return -(-c // 128) * 128


def _prelu(v, a):
    return jnp.where(v >= 0, v, a * v)


def cgblock_pre_ref(x, w1, a1, b1, p1, dwl, dws, a2, b2, p2, *, d: int):
    """XLA reference for the fused part: x -> j (pre-gate activation).

    w1: (C, C/2) reduce weights; a/b: folded BN scale/offset (f32);
    p1: (C/2,) PReLU slopes; dwl/dws: (3, 3, C/2) depthwise taps;
    a2/b2/p2: (C,) join affine + slopes; d: surround dilation.
    """
    half = w1.shape[1]
    y = jnp.einsum("nhwc,cd->nhwd", x, w1.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    y = _prelu(y * a1 + b1, p1).astype(x.dtype)
    loc = C.depthwise_conv2d(y, dwl[:, :, None, :], stride=1, padding=1)
    sur = C.depthwise_conv2d(y, dws[:, :, None, :], stride=1, padding=d,
                             dilation=d)
    j = jnp.concatenate([loc, sur], axis=-1).astype(jnp.float32)
    return _prelu(j * a2 + b2, p2).astype(x.dtype)


def _pick_tile(h: int, w: int, c: int, d: int, itemsize: int):
    """Largest divisor TH of h whose working set fits the VMEM budget."""
    half = c // 2
    cp, hp = _pad128(c), _pad128(half)
    best = None
    for th in range(1, h + 1):
        if h % th:
            continue
        th_in = th + 2 * d
        if th_in > h:
            break
        need = (
            2 * th_in * w * cp * itemsize            # double-buffered x
            + (th_in + 2 * d) * (w + 2 * d) * hp * itemsize  # y_pad (bf16)
            + 2 * th * w * hp * 4                    # loc/sur f32 accum
            + 2 * th * w * cp * itemsize             # double-buffered j
            + th * w * cp * 4                        # join f32 temp
        )
        if need <= _VMEM_BUDGET:
            best = (th, th_in)
        else:
            break
    return best


def _kernel(x_ref, w1_ref, a1_ref, b1_ref, p1_ref, dwl_ref, dws_ref,
            a2_ref, b2_ref, p2_ref, j_ref, gap_ref,
            *, th: int, th_in: int, d: int, h: int, w: int, half: int):
    t = pl.program_id(1)
    start = jnp.clip(t * th - d, 0, h - th_in)
    off = t * th - d - start            # in {-d, 0, +d}

    xv = x_ref[0]                                       # (th_in, W, C)
    y = jnp.dot(xv.reshape(th_in * w, xv.shape[-1]), w1_ref[:],
                preferred_element_type=jnp.float32)
    y = _prelu(y * a1_ref[:].astype(jnp.float32)
               + b1_ref[:].astype(jnp.float32),
               p1_ref[:].astype(jnp.float32))
    y = y.reshape(th_in, w, half).astype(xv.dtype)
    # SAME padding pads the REDUCED activation with zeros: place y into a
    # zeroed buffer with d rows/cols of margin (+d extra rows to absorb
    # the clamp shift)
    yp = jnp.pad(y, ((2 * d, 2 * d), (d, d), (0, 0)))

    def taps(row0):
        # row0 = off + 2d, resolved statically per switch branch
        def go(yp):
            accl = jnp.zeros((th, w, half), jnp.float32)
            accs = jnp.zeros((th, w, half), jnp.float32)
            for u in range(3):
                for v in range(3):
                    rl = row0 + (u - 1) + d
                    tapl = yp[rl:rl + th, d + (v - 1):d + (v - 1) + w]
                    accl = accl + tapl.astype(jnp.float32) \
                        * dwl_ref[u, v, :].astype(jnp.float32)
                    rs = row0 + (u - 1) * d + d
                    taps_ = yp[rs:rs + th, d + (v - 1) * d:
                               d + (v - 1) * d + w]
                    accs = accs + taps_.astype(jnp.float32) \
                        * dws_ref[u, v, :].astype(jnp.float32)
            return accl, accs
        return go

    # the clamp shift is 0 for every interior tile, -d for the first and
    # +d for the last; row0 = off + 2d in {d, 2d, 3d}
    accl, accs = lax.switch(
        (off + d) // max(d, 1) if d > 0 else 0,
        [taps(d), taps(2 * d), taps(3 * d)], yp)

    a2 = a2_ref[:].astype(jnp.float32)
    b2 = b2_ref[:].astype(jnp.float32)
    p2 = p2_ref[:].astype(jnp.float32)
    jl = _prelu(accl * a2[:half] + b2[:half], p2[:half])
    js = _prelu(accs * a2[half:] + b2[half:], p2[half:])
    j = jnp.concatenate([jl, js], axis=-1)
    j_ref[0] = j.astype(j_ref.dtype)
    gap_ref[0, 0] = jnp.sum(j, axis=(0, 1))


def _cgblock_pre_pallas(x, w1, a1, b1, p1, dwl, dws, a2, b2, p2, *, d,
                        interpret=False):
    n, h, w, c = x.shape
    half = c // 2
    isize = jnp.dtype(x.dtype).itemsize
    pick = _pick_tile(h, w, c, d, isize) if (interpret or
                                             (h >= 64 and w >= 64)) else None
    if pick is None:
        j = cgblock_pre_ref(x, w1, a1, b1, p1, dwl, dws, a2, b2, p2, d=d)
        return j, jnp.sum(j.astype(jnp.float32), axis=(1, 2))
    th, th_in = pick

    kern = functools.partial(_kernel, th=th, th_in=th_in, d=d, h=h, w=w,
                             half=half)
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    j, gap = pl.pallas_call(
        kern,
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec(
                (Element(1), Element(th_in), Element(w), Element(c)),
                lambda n_, t_: (n_, jnp.clip(t_ * th - d, 0, h - th_in),
                                0, 0),
                memory_space=pltpu.VMEM),
            vec, vec, vec, vec, vec, vec, vec, vec, vec,
        ],
        out_specs=(
            pl.BlockSpec((1, th, w, c), lambda n_, t_: (n_, t_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda n_, t_: (n_, t_, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
            jax.ShapeDtypeStruct((n, h // th, c), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(_VMEM_BUDGET * 2.2)),
        cost_estimate=pl.CostEstimate(
            flops=n * h * w * (2 * c * half + 18 * half * 2),
            bytes_accessed=2 * x.size * isize,
            transcendentals=0),
        interpret=interpret,
    )(x, w1.astype(x.dtype), a1, b1, p1, dwl, dws, a2, b2, p2)
    return j, jnp.sum(gap, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def _cgblock_pre(x, w1, a1, b1, p1, dwl, dws, a2, b2, p2, d, interpret):
    return _cgblock_pre_pallas(x, w1, a1, b1, p1, dwl, dws, a2, b2, p2,
                               d=d, interpret=interpret)


def _fwd(x, w1, a1, b1, p1, dwl, dws, a2, b2, p2, d, interpret):
    out = _cgblock_pre(x, w1, a1, b1, p1, dwl, dws, a2, b2, p2, d,
                       interpret)
    return out, (x, w1, a1, b1, p1, dwl, dws, a2, b2, p2)


def _bwd(d, interpret, res, g):
    gj, ggap = g

    def ref(*args):
        j = cgblock_pre_ref(*args, d=d)
        return j, jnp.sum(j.astype(jnp.float32), axis=(1, 2))

    _, vjp = jax.vjp(ref, *res)
    return vjp((gj, ggap))


_cgblock_pre.defvjp(_fwd, _bwd)


def fused_cgblock_pre(x, w1, a1, b1, p1, dwl, dws, a2, b2, p2, *,
                      d: int, impl: str = "auto"):
    """Fused ``x -> (j, sum_hw(j))`` for the CG block (see module doc).

    Returns the pre-gate activation j (N,H,W,C) and its f32 spatial sum
    (N,C) for the FGlo gate. impl: 'auto' | 'pallas' | 'xla' |
    'interpret'.
    """
    if impl == "auto":
        import os
        # default OFF until the TPU Mosaic compile is validated/measured:
        # the first bench attempt hung in compile (>9 min) — see STATUS.md
        mode = os.environ.get("ESN_TPU_PALLAS_CG", "0")
        wins = (mode == "1" and jax.default_backend() == "tpu"
                and x.shape[-1] >= 64)
        impl = "pallas" if wins else "xla"
    if impl == "xla":
        j = cgblock_pre_ref(x, w1, a1, b1, p1, dwl, dws, a2, b2, p2, d=d)
        return j, jnp.sum(j.astype(jnp.float32), axis=(1, 2))
    return _cgblock_pre(x, w1, a1, b1, p1, dwl, dws, a2, b2, p2, d,
                        impl == "interpret")
