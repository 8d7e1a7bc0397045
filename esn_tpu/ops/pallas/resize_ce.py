"""VMEM-resident fused bilinear-upsample + cross-entropy (Pallas).

The reference trains every resize-tail model on logits upsampled to label
resolution [R: train.py loss over F.interpolate'd logits]. Materialized,
that tail costs ~9 ms of the 57 ms b8 full-res fastscnn step (r5
tools/audit_dx: resize dot 2.7 ms + CE fusions 3.9 ms @ 95% HBM + bwd
resize 2.5 ms) because the (B,H,W,C) logits and their cotangent round-trip
HBM. The XLA scan rewrite (losses.resize_cross_entropy) is exact but
measured 2.4x SLOWER — its block temporaries spill anyway.

This kernel computes the SAME (weighted-sum, weight-sum) pair with the
lowres logits resident in VMEM. The enabling observation: the horizontal
2-tap interpolation of a whole output row is ONE matmul with a constant
sparse expansion matrix E (w x W, two nonzeros per column, clamping folded
in), so there is no lane interleave anywhere — labels stay in natural
(rows, W) layout with W in lanes, rows are phase-blended in sublanes, and
the MXU does the upsample for ~0.1 ms/step of flops. Backward is the
transpose: dLrow = g @ E^T with g = w_pix*(softmax - smoothed-onehot),
accumulated into per-block padded row slabs and overlap-added outside.

Semantics match losses.resize_cross_entropy: upsample in f32 (half-pixel
centers, clamped 2-tap — identical to ops/resize.resize_bilinear),
torch-reduction CE with class weights / ignore_index / label smoothing.
Exactness is parity-tested against cross_entropy(resize_bilinear(z)) in
tests/test_pallas_resize_ce.py (interpret mode on CPU, real kernel on TPU).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fracs(r: int):
    """Per-phase (row-tap offset selector, fraction on the upper tap)."""
    out = []
    for p in range(r):
        d = (p + 0.5) / r - 0.5
        out.append((0, 1.0 + d) if d < 0 else (1, d))
    return out


def _expand_matrix(w: int, r: int) -> np.ndarray:
    """(w, w*r) f32: column j holds the 2-tap half-pixel bilinear weights
    of output column j over the lowres columns (edge taps clamped —
    identical to jax.image.resize's renormalized 2-tap kernel)."""
    W = w * r
    E = np.zeros((w, W), np.float32)
    for j in range(W):
        x = (j + 0.5) / r - 0.5
        x0 = int(np.floor(x))
        f = x - x0
        E[min(max(x0, 0), w - 1), j] += 1.0 - f
        E[min(max(x0 + 1, 0), w - 1), j] += f
    return E


def _fwd_kernel(z_ref, lab_ref, cw_ref, e_ref, out_ref, *, r, rb, c,
                ignore_index, eps):
    """z_ref: (1, C, rb+2, w) clamp-padded logit rows; lab_ref:
    (1, rb*r, W) int32; cw_ref: (c, 1) f32; e_ref: (w, W) f32;
    out_ref: (1, 2) f32 accumulator (S, N) shared by every grid step."""
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # z_ref carries ALL h+2 clamp-padded rows (the rb+2 windows of
    # consecutive grid steps OVERLAP by 2, which block indexing cannot
    # express); slice this step's window at a sublane-aligned offset
    r0 = pl.program_id(1) * rb
    rows = z_ref[0, :, pl.ds(r0, rb + 2), :].astype(jnp.float32)
    E = e_ref[...]
    cw = cw_ref[...]                             # (c, 1)
    W = lab_ref.shape[2]
    fr = _fracs(r)
    iota_c = lax.broadcasted_iota(jnp.int32, (r, c, W), 1)
    acc_s = jnp.float32(0.0)
    acc_n = jnp.float32(0.0)
    for yy in range(rb):
        # all r row phases of this lowres row in ONE (r*C, w)@(w, W)
        # matmul (per-phase (C, w) matmuls under-fill the MXU 8x)
        blends = jnp.concatenate(
            [rows[:, yy + off, :] + f * (rows[:, yy + off + 1, :]
                                         - rows[:, yy + off, :])
             for off, f in fr], axis=0)          # (r*C, w)
        lup = jnp.dot(blends, E,
                      preferred_element_type=jnp.float32)  # (r*C, W)
        lup = lup.reshape(r, c, W)
        lab = lab_ref[0, pl.ds(yy * r, r), :]    # (r, W) int32
        valid = jnp.logical_and(lab != ignore_index, lab < c)
        valid = jnp.logical_and(valid, lab >= 0)
        safe = jnp.where(valid, lab, 0)
        onehot = iota_c == safe[:, None, :]
        m = jnp.max(lup, axis=1)                 # (r, W)
        ez = jnp.sum(jnp.exp(lup - m[:, None, :]), axis=1)
        lse = m + jnp.log(ez)
        true_logit = jnp.sum(jnp.where(onehot, lup, 0.0), axis=1)
        nll = lse - true_logit
        if eps > 0.0:
            nll = (1.0 - eps) * nll + eps * (lse - jnp.mean(lup, axis=1))
        wpix = jnp.sum(jnp.where(onehot, cw[None], 0.0), axis=1)
        wpix = jnp.where(valid, wpix, 0.0)
        acc_s += jnp.sum(wpix * nll)
        acc_n += jnp.sum(wpix)
    out_ref[...] = out_ref[...] + jnp.stack([acc_s, acc_n]).reshape(1, 2)


def _bwd_kernel(z_ref, lab_ref, cw_ref, e_ref, g_ref, dz_ref, *,
                r, rb, c, ignore_index, eps):
    """dz_ref: (1, C, rb+2, w) — this block's PADDED row slab (disjoint
    per grid step; halo rows overlap-added outside). g_ref: (1, 1) f32 in
    SMEM = cotangent of S (N is logits-independent). The adjoint matmul
    contracts against E's W axis directly (no E^T operand — VMEM)."""
    r0 = pl.program_id(1) * rb
    rows = z_ref[0, :, pl.ds(r0, rb + 2), :].astype(jnp.float32)
    E = e_ref[...]                                # (w, W)
    cw = cw_ref[...]
    gS = g_ref[0, 0]
    W = lab_ref.shape[2]
    fr = _fracs(r)
    iota_c = lax.broadcasted_iota(jnp.int32, (r, c, W), 1)
    w = rows.shape[-1]
    # per-row accumulators as Python bindings: all indices are static, so
    # the final stack is one VMEM write (Mosaic has no scatter-add)
    slab_rows = [jnp.zeros((c, w), jnp.float32) for _ in range(rb + 2)]
    for yy in range(rb):
        blends = jnp.concatenate(
            [rows[:, yy + off, :] + f * (rows[:, yy + off + 1, :]
                                         - rows[:, yy + off, :])
             for off, f in fr], axis=0)           # (r*C, w)
        lup = jnp.dot(blends, E,
                      preferred_element_type=jnp.float32).reshape(r, c, W)
        lab = lab_ref[0, pl.ds(yy * r, r), :]     # (r, W)
        valid = jnp.logical_and(lab != ignore_index, lab < c)
        valid = jnp.logical_and(valid, lab >= 0)
        safe = jnp.where(valid, lab, 0)
        onehot = iota_c == safe[:, None, :]
        m = jnp.max(lup, axis=1)
        ez = jnp.exp(lup - m[:, None, :])
        soft = ez / jnp.sum(ez, axis=1, keepdims=True)
        wpix = jnp.sum(jnp.where(onehot, cw[None], 0.0), axis=1)
        wpix = jnp.where(valid, wpix, 0.0)
        # d nll / d lup = softmax - (1-eps)*onehot - eps/C
        g = soft - (1.0 - eps) * onehot.astype(jnp.float32)
        if eps > 0.0:
            g = g - eps / c
        g = g * (gS * wpix)[:, None, :]           # (r, C, W)
        dblend = lax.dot_general(
            g.reshape(r * c, W), E, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(r, c, w)
        for p, (off, f) in enumerate(fr):
            slab_rows[yy + off] = slab_rows[yy + off] \
                + (1.0 - f) * dblend[p]
            slab_rows[yy + off + 1] = slab_rows[yy + off + 1] \
                + f * dblend[p]
    dz_ref[...] = jnp.stack(slab_rows, axis=1)[None, None]


def _pick_rb(h: int) -> int:
    for rb in (8, 4, 2, 1):
        if h % rb == 0:
            return rb
    return 1


def resize_ce_sums(z, labels, class_weights, *, r: int,
                   ignore_index: int = 255, label_smoothing: float = 0.0,
                   interpret: bool = False):
    """(S, N) = (sum_i w_i * nll_i, sum_i w_i) over full-res pixels of
    CE(bilinear_upsample_r(z), labels); differentiable in ``z`` via a
    Pallas backward. labels/class_weights are closed over (no cotangent).
    """
    B, h, w, C = z.shape
    H, W = labels.shape[1], labels.shape[2]
    assert (H, W) == (h * r, w * r), (z.shape, labels.shape, r)
    rb = _pick_rb(h)
    E = jnp.asarray(_expand_matrix(w, r))
    cw = (jnp.ones((C,), jnp.float32) if class_weights is None
          else jnp.asarray(class_weights, jnp.float32)).reshape(C, 1)
    labels = labels.astype(jnp.int32)

    def pad_rows(zt):
        return jnp.concatenate([zt[:, :, :1], zt, zt[:, :, -1:]], axis=2)

    grid = (B, h // rb)
    kwargs = dict(r=r, rb=rb, c=C, ignore_index=ignore_index,
                  eps=float(label_smoothing))

    @jax.custom_vjp
    def sums(zz):
        zt = pad_rows(jnp.transpose(zz, (0, 3, 1, 2)))   # (B, C, h+2, w)
        out = pl.pallas_call(
            partial(_fwd_kernel, **kwargs),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, C, h + 2, w), lambda b, i: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rb * r, W), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, 1), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w, W), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 2), lambda b, i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 2), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * B * C * w * W * h * 2,
                bytes_accessed=labels.size * 4 + z.size * 4,
                transcendentals=B * H * W),
            interpret=interpret,
        )(zt, labels, cw, E)
        return out[0, 0], out[0, 1]

    def sums_fwd(zz):
        return sums(zz), zz

    def sums_bwd(zz, gg):
        gS, _gN = gg    # N is independent of z
        zt = pad_rows(jnp.transpose(zz, (0, 3, 1, 2)))
        # the bwd's unrolled (row, phase) temporaries overflow the 16M
        # DEFAULT scoped-vmem limit at rb=8 (measured 21.2M needed);
        # smaller blocks can't help because the dynamic row-window offset
        # must stay 8-sublane-aligned — raise the limit instead (v5e has
        # headroom above the conservative default)
        rbb = rb
        nblk = h // rbb
        bkwargs = dict(kwargs, rb=rbb)
        dz_slabs = pl.pallas_call(
            partial(_bwd_kernel, **bkwargs),
            grid=(B, nblk),
            in_specs=[
                pl.BlockSpec((1, C, h + 2, w), lambda b, i: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rbb * r, W), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, 1), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w, W), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, C, rbb + 2, w),
                                   lambda b, i: (b, i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, nblk, C, rbb + 2, w),
                                           jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=4 * B * C * w * W * h * 2,
                bytes_accessed=labels.size * 4 + 2 * z.size * 4,
                transcendentals=B * H * W),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(zt, labels, cw, E,
          jnp.asarray(gS, jnp.float32).reshape(1, 1))
        # overlap-add the padded slabs: slab i's rows cover original rows
        # [i*rbb-1, i*rbb+rbb+1) (clamp-padded indexing)
        acc = jnp.zeros((B, C, h + 2, w), jnp.float32)
        for i in range(nblk):
            acc = acc.at[:, :, i * rbb:i * rbb + rbb + 2, :].add(
                dz_slabs[:, i])
        # clamp adjoint: the two padding rows fold onto the edge rows
        core = acc[:, :, 1:h + 1, :]
        core = core.at[:, :, 0, :].add(acc[:, :, 0, :])
        core = core.at[:, :, h - 1, :].add(acc[:, :, h + 1, :])
        dz = jnp.transpose(core, (0, 2, 3, 1)).astype(zz.dtype)
        return (dz,)

    sums.defvjp(sums_fwd, sums_bwd)
    return sums(z)
