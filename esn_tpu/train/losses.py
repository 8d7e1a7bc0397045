"""Segmentation loss zoo — jit-safe, static-shape formulations.

Reference: ``utils/loss.py`` [R] — CrossEntropyLoss2d (class-weighted NLL),
CrossEntropyLoss2dLabelSmooth (eps=0.1), ProbOhemCrossEntropy2d (thresh=0.7,
min_kept=B*H*W/16), FocalLoss2d (gamma=2), LovaszSoftmax.

TPU-native departures from the reference:
- OHEM's dynamic "keep the hardest pixels" is reformulated with a static
  ``lax.top_k`` threshold so the whole loss stays inside one jitted graph
  (the reference sorts on device but with dynamic shapes, fine for eager
  CUDA, impossible under XLA).
- Lovász's "flatten and drop ignored pixels" is replaced by masked sorting:
  ignored pixels get error 0 / fg 0 and sort to the tail where they
  contribute nothing to the dot product, so shapes stay static.

All functions take NHWC logits, (N, H, W) int labels and reduce in fp32.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def _valid_mask(labels: jnp.ndarray, num_classes: int,
                ignore_index: int) -> jnp.ndarray:
    return (labels != ignore_index) & (labels >= 0) & (labels < num_classes)


def _safe_labels(labels, num_classes, valid):
    return jnp.where(valid, labels, 0).astype(jnp.int32)


def _per_pixel_ce(logits: jnp.ndarray, labels: jnp.ndarray, num_classes: int,
                  ignore_index: int, label_smoothing: float = 0.0):
    """Returns (ce, weight-lookup labels, valid mask); ce is fp32 per pixel.

    Formulated WITHOUT gathers or a materialized log_softmax:
    ``nll = logsumexp(logits) - logits[true]`` where the true-class pick is a
    one-hot masked reduction. A minor-axis ``take_along_axis`` plus full
    ``log_softmax`` costs ~290 ms at (8,1024,2048,19) on v5e (measured —
    tools/bench_fwd_bisect.py, 17x the entire model forward); the fused
    iota-compare reductions below are single passes over the logits.
    """
    logits32 = logits.astype(jnp.float32)
    valid = _valid_mask(labels, num_classes, ignore_index)
    safe = _safe_labels(labels, num_classes, valid)
    onehot = (lax.broadcasted_iota(jnp.int32, logits.shape, logits.ndim - 1)
              == safe[..., None])
    lse = jax.scipy.special.logsumexp(logits32, axis=-1)
    true_logit = jnp.sum(jnp.where(onehot, logits32, 0.0), axis=-1)
    nll = lse - true_logit
    if label_smoothing > 0.0:
        eps = label_smoothing
        # mean over classes of -logp_c == lse - mean(logits)
        nll = (1.0 - eps) * nll + eps * (lse - jnp.mean(logits32, axis=-1))
    return nll, safe, valid


def _weights_at(class_weights: jnp.ndarray, safe: jnp.ndarray,
                num_classes: int) -> jnp.ndarray:
    """Per-pixel class-weight lookup as a one-hot contraction (gather-free)."""
    cw = class_weights.astype(jnp.float32)
    onehot = (lax.broadcasted_iota(jnp.int32, safe.shape + (num_classes,),
                                   safe.ndim)
              == safe[..., None])
    return jnp.sum(jnp.where(onehot, cw, 0.0), axis=-1)


def cross_entropy(logits, labels, *, num_classes: int,
                  class_weights: Optional[jnp.ndarray] = None,
                  ignore_index: int = 255,
                  label_smoothing: float = 0.0) -> jnp.ndarray:
    """Class-weighted CE with ignore_index, torch reduction semantics:
    ``sum(w[y_i] * ce_i) / sum(w[y_i])`` over valid pixels."""
    nll, safe, valid = _per_pixel_ce(logits, labels, num_classes,
                                     ignore_index, label_smoothing)
    if class_weights is not None:
        w = _weights_at(class_weights, safe, num_classes)
    else:
        w = jnp.ones_like(nll)
    w = w * valid.astype(jnp.float32)
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-8)


def resize_cross_entropy(z, labels, *, num_classes: int,
                         class_weights: Optional[jnp.ndarray] = None,
                         ignore_index: int = 255,
                         label_smoothing: float = 0.0) -> jnp.ndarray:
    """CE(bilinear_upsample(z), labels) WITHOUT materializing the
    full-res logits or their cotangent.

    The reference trains every resize-tail model on logits upsampled to
    label resolution [R: train.py loss over F.interpolate'd logits]. At
    2048x1024 b8 that (B,H,W,19) tensor plus its backward cotangent is
    the largest removable byte slab of an HBM-saturated train step
    (measured 8.6 ms of 59.7 — see tools/bench_train_decomp.py and the
    BOUNDS.md training section). Here the SAME scalar is computed by a
    ``lax.scan`` over one-lowres-row blocks (s = H/h full-res rows): per
    block, slice the <=3 contributing lowres rows, apply the half-pixel
    bilinear taps (identical semantics to ops/resize.py — for a 2-tap
    kernel, edge clamping equals jax.image.resize's weight
    renormalization), run the gather-free CE, and accumulate
    (weighted-sum, weight-sum). Block intermediates are ~s*W*C (VMEM
    scale); the backward accumulates directly into the small lowres dz
    via dynamic_update_slice adds — no full-res scatter ever exists.
    Exact in f32 (parity-tested against cross_entropy∘resize_bilinear);
    on TPU it additionally skips the bf16 rounding the unfused path
    applies to the resized logits.

    Requires an integer isotropic scale; anything else falls back to the
    materialized path.
    """
    B, h, w, C = z.shape
    Hl, Wl = labels.shape[1], labels.shape[2]
    from ..ops.resize import resize_bilinear
    if Hl % h or Wl % w or Hl // h != Wl // w or Hl == h:
        full = resize_bilinear(z.astype(jnp.float32), (Hl, Wl))
        return cross_entropy(full, labels, num_classes=num_classes,
                             class_weights=class_weights,
                             ignore_index=ignore_index,
                             label_smoothing=label_smoothing)
    s = Hl // h
    if (os.environ.get("ESN_TPU_FUSED_CE", "0") == "2" and h % 8 == 0
            and jax.devices()[0].platform not in ("cpu",)):
        # VMEM-resident Pallas kernel (ops/pallas/resize_ce.py): the
        # r5 audit measured the materialized tail at ~9 ms of the 57 ms
        # b8 fastscnn step; the isolated val+grad A/B measured
        # 7.57 ms (kernel) vs 14.97 ms (materialized) at (8,128,256,19)
        # x8. Same scalar (CPU-oracle parity <=4e-6 relL2).
        from ..ops.pallas.resize_ce import resize_ce_sums
        S, N = resize_ce_sums(z.astype(jnp.float32), labels, class_weights,
                              r=s, ignore_index=ignore_index,
                              label_smoothing=label_smoothing)
        return S / jnp.maximum(N, 1e-8)
    kw = min(3, h)
    phases = []
    for p in range(s):
        phi = (p + 0.5) / s - 0.5
        io = -1 if phi < 0 else 0
        phases.append((io, phi - io))           # static (offset, frac)

    # (h, B, s, W) label blocks as scan xs
    ys = labels.reshape(B, h, s, Wl).transpose(1, 0, 2, 3)
    cw = None if class_weights is None else class_weights

    def body(carry, inp):
        q, yb = inp
        num, den = carry
        w0 = jnp.clip(q - 1, 0, h - kw)
        win = lax.dynamic_slice(z, (0, w0, 0, 0),
                                (B, kw, w, C)).astype(jnp.float32)
        # column upsample by phase: static slices of an edge-padded copy
        # (transpose = pad-add; no scatter)
        winp = jnp.pad(win, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
        cols = []
        for io, t in phases:
            a = lax.slice_in_dim(winp, 1 + io, 1 + io + w, axis=2)
            b = lax.slice_in_dim(winp, 2 + io, 2 + io + w, axis=2)
            cols.append((1.0 - t) * a + t * b)
        # interleave phases: (B, kw, w, s, C) -> (B, kw, W, C)
        colw = jnp.stack(cols, axis=3).reshape(B, kw, Wl, C)
        rows = []
        for io, t in phases:
            r0 = jnp.clip(q + io, 0, h - 1) - w0
            r1 = jnp.clip(q + io + 1, 0, h - 1) - w0
            rows.append((1.0 - t) * jnp.take(colw, r0, axis=1)
                        + t * jnp.take(colw, r1, axis=1))
        block = jnp.stack(rows, axis=1)          # (B, s, W, C) f32
        nll, safe, valid = _per_pixel_ce(block, yb, num_classes,
                                         ignore_index, label_smoothing)
        wv = valid.astype(jnp.float32) if cw is None else \
            _weights_at(cw, safe, num_classes) * valid.astype(jnp.float32)
        return (num + jnp.sum(wv * nll), den + jnp.sum(wv)), None

    (num, den), _ = lax.scan(
        body, (jnp.float32(0), jnp.float32(0)),
        (jnp.arange(h, dtype=jnp.int32), ys))
    return num / jnp.maximum(den, 1e-8)


def kth_smallest(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Exact k-th smallest (1-indexed, static ``k``) of a 1-D array of
    non-negative finite float32s, in O(N).

    ``lax.top_k`` over the B*H*W≈16.7M per-pixel probabilities costs ~29%
    of the full-res OHEM train step (config 5) — a k-element sort network
    materialized for ONE scalar. This instead runs a monotone radix search
    over the IEEE-754 bit pattern (order-isomorphic to the value for
    x >= 0): eight fused compare+count sweeps, each testing 16 candidate
    upper bounds for one nibble of the answer. Level invariant: ``lo`` is
    the smallest value with the resolved high nibbles such that
    ``count(bits <= lo | low_mask) >= k``; after the last level ``lo`` is
    bit-exactly the k-th smallest element's pattern.
    """
    bits = lax.bitcast_convert_type(
        lax.stop_gradient(x).astype(jnp.float32).reshape(-1), jnp.uint32)
    if bits.size % 128 == 0:  # native lane tiling; avoids a padded minor axis
        bits = bits.reshape(-1, 128)
    kk = jnp.int32(k)
    lo = jnp.zeros((), jnp.uint32)
    for level in range(8):
        shift = 28 - 4 * level
        low_mask = jnp.uint32((1 << shift) - 1)
        # 16 scalar-broadcast counts fused into one sweep (measured 2.45 ms
        # vs 3.03 for a lane-padded (N,16) compare and 39.8 for top_k at
        # N=16.7M on v5e — tools/bench_ohem_kth.py)
        counts = jnp.stack([
            jnp.sum((bits <= (lo | (jnp.uint32(d) << shift) | low_mask))
                    .astype(jnp.int32))
            for d in range(16)])                                # monotone
        d = jnp.sum((counts < kk).astype(jnp.uint32))  # first digit w/ cnt>=k
        lo = lo | (d << shift)
    return lax.bitcast_convert_type(lo, jnp.float32)


def ohem_cross_entropy(logits, labels, *, num_classes: int,
                       class_weights: Optional[jnp.ndarray] = None,
                       ignore_index: int = 255, thresh: float = 0.7,
                       min_kept: Optional[int] = None) -> jnp.ndarray:
    """Online hard example mining CE (reference ProbOhemCrossEntropy2d [R]).

    Keeps pixels whose true-class probability is below a threshold; the
    threshold is raised to the ``min_kept``-th hardest pixel's probability so
    at least ``min_kept`` pixels always survive. Static shapes: the kept set
    is a mask, never a gather.
    """
    n, h, w_, _ = logits.shape
    total = n * h * w_
    if min_kept is None:
        min_kept = max(total // 16, 1)
    min_kept = int(min(min_kept, total))

    nll, safe, valid = _per_pixel_ce(logits, labels, num_classes, ignore_index)
    # p_true = exp(-nll): no softmax materialization, no gather
    p_true = jnp.exp(-nll)
    # invalid pixels can never be "hard": give them prob 2.0 (> any real prob)
    p_true = jnp.where(valid, p_true, 2.0).reshape(-1)

    # threshold = max(thresh, prob of the min_kept-th hardest pixel);
    # exact O(N) radix select by default, lax.top_k behind an escape hatch
    # (bit-identical results — see tests/test_losses.py kept-mask parity)
    if os.environ.get("ESN_TPU_OHEM_TOPK", "0") == "1":
        kth = -jax.lax.top_k(-p_true, min_kept)[0][-1]
    else:
        kth = kth_smallest(p_true, min_kept)
    threshold = jnp.maximum(kth, thresh)
    kept = (p_true <= threshold) & valid.reshape(-1)

    nll = nll.reshape(-1)
    if class_weights is not None:
        w = _weights_at(class_weights, safe.reshape(-1), num_classes)
    else:
        w = jnp.ones_like(nll)
    w = w * kept.astype(jnp.float32)
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-8)


def focal_loss(logits, labels, *, num_classes: int,
               class_weights: Optional[jnp.ndarray] = None,
               ignore_index: int = 255, gamma: float = 2.0) -> jnp.ndarray:
    """Focal loss (reference FocalLoss2d, gamma=2 [R])."""
    nll, safe, valid = _per_pixel_ce(logits, labels, num_classes, ignore_index)
    p_true = jnp.exp(-nll)
    focal = jnp.power(1.0 - p_true, gamma) * nll
    if class_weights is not None:
        w = _weights_at(class_weights, safe, num_classes)
    else:
        w = jnp.ones_like(focal)
    w = w * valid.astype(jnp.float32)
    return jnp.sum(w * focal) / jnp.maximum(jnp.sum(w), 1e-8)


def _lovasz_grad(gt_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovász extension w.r.t. sorted errors (1D, fp32)."""
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-8)
    # difference trick: grad[0] = jaccard[0], grad[i] = jaccard[i]-jaccard[i-1]
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


def lovasz_softmax(logits, labels, *, num_classes: int,
                   ignore_index: int = 255,
                   class_weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Multi-class Lovász-Softmax over present classes (reference
    LovaszSoftmax [R], per_image=False, classes='present').

    ``class_weights`` is accepted for API symmetry but unused (the Lovász
    extension is inherently class-balanced).

    Cost note (measured, v5e): the extension needs the FULL descending
    sort of the per-class errors over all B·H·W pixels, x num_classes —
    at 2048x1024 that is 19 sorts of 8.4M elements and training runs at
    ~1.3 img/s vs ~150 for CE/OHEM (benchmarks/zoo_train_lovasz_*.json).
    A counting-sweep reformulation DOES exist (round-3's "no shortcut
    without changing the gradient" was over-strong): quantizing errors to
    4096 buckets and using the tie-block-average gradient —
    ``lovasz_softmax_hist`` below — is exact up to a <=1.2e-4 key
    quantization and runs 6.2x faster (8.0 img/s, same benchmark json).
    Both remain far from CE/OHEM; prefer OHEM at production resolution.
    """
    del class_weights
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    probs = probs.reshape(-1, num_classes)
    labels_f = labels.reshape(-1)
    valid = _valid_mask(labels_f, num_classes, ignore_index)
    safe = _safe_labels(labels_f, num_classes, valid)
    validf = valid.astype(jnp.float32)

    def class_loss(c):
        fg = (safe == c).astype(jnp.float32) * validf
        errors = jnp.abs(fg - probs[:, c]) * validf  # ignored -> 0, sorts last
        # descending sort of errors, carrying fg along
        neg_err, fg_sorted = jax.lax.sort((-errors, fg), num_keys=1)
        errors_sorted = -neg_err
        grad = _lovasz_grad(fg_sorted)
        loss_c = jnp.dot(errors_sorted, grad)
        present = jnp.sum(fg) > 0
        return loss_c, present

    losses, presents = jax.vmap(class_loss)(jnp.arange(num_classes))
    presents = presents.astype(jnp.float32)
    return jnp.sum(losses * presents) / jnp.maximum(jnp.sum(presents), 1e-8)


def _lovasz_bucket_tables(errors, fg, validf, n_buckets, chunk):
    """Per-class per-bucket Lovász coefficients, by counting — no sort.

    Quantize each error to a ``n_buckets``-level linear key. Within a tie
    block the sorted dot product telescopes: its value only needs the
    block-boundary Jaccard values, which only need per-bucket (count, fg)
    totals. Histograms are built as one-hot matmuls over pixel chunks
    (MXU work; XLA scatter-add and `sort` never appear). Returns the
    (C, n_buckets) table of per-pixel coefficients ΔJaccard(b)/count(b)
    — the average Lovász gradient over each tie block.
    """
    nb = n_buckets
    side = int(nb ** 0.5)
    assert side * side == nb
    n, C = errors.shape
    q = jnp.clip((errors * (nb - 1)).astype(jnp.int32), 0, nb - 1)
    hi, lo = q // side, q % side
    iota = jnp.arange(side, dtype=jnp.int32)

    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    if pad:
        z = lambda a: jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
        hi, lo, fg, validf = z(hi), z(lo), z(fg), z(validf)
    hi = hi.reshape(n_chunks, chunk, C)
    lo = lo.reshape(n_chunks, chunk, C)
    fgc = fg.reshape(n_chunks, chunk, C)
    vc = validf.reshape(n_chunks, chunk)

    def body(acc, args):
        h, l, f, v = args
        outs = []
        for c in range(C):
            ph = (h[:, c, None] == iota).astype(jnp.bfloat16)
            pl = (l[:, c, None] == iota).astype(jnp.bfloat16)
            data = jnp.stack([v, f[:, c] * v], -1)  # count, fg
            b = (pl[:, :, None] * data[:, None, :]).reshape(chunk, side * 2)
            m = jax.lax.dot(ph.T, b.astype(jnp.bfloat16),
                            precision=lax.Precision.DEFAULT,
                            preferred_element_type=jnp.float32)
            outs.append(m.reshape(side, side, 2))
        return acc + jnp.stack(outs), None

    hist0 = jnp.zeros((C, side, side, 2), jnp.float32)
    hist, _ = lax.scan(body, hist0, (hi, lo, fgc, vc))
    hist = hist.reshape(C, nb, 2)

    # descending bucket order (largest errors first), per class
    n_b = hist[:, ::-1, 0]
    fg_b = hist[:, ::-1, 1]
    gts = jnp.sum(fg_b, axis=1, keepdims=True)
    cum_n = jnp.cumsum(n_b, axis=1)
    cum_fg = jnp.cumsum(fg_b, axis=1)
    inter = gts - cum_fg
    union = gts + (cum_n - cum_fg)
    jac = 1.0 - inter / jnp.maximum(union, 1e-8)
    djac = jnp.concatenate([jac[:, :1], jac[:, 1:] - jac[:, :-1]], axis=1)
    coef = djac / jnp.maximum(n_b, 1.0)          # avg grad over the block
    coef = coef[:, ::-1]                          # back to bucket-id order
    present = gts[:, 0] > 0
    # absent classes are excluded from the mean (reference
    # classes='present'); zero their tables so pass B can sum plainly
    coef = coef * present[:, None].astype(jnp.float32)
    return lax.stop_gradient(coef), present


def lovasz_softmax_hist(logits, labels, *, num_classes: int,
                        ignore_index: int = 255,
                        class_weights: Optional[jnp.ndarray] = None,
                        n_buckets: int = 4096,
                        chunk: int = 1 << 15) -> jnp.ndarray:
    """Counting-sweep Lovász-Softmax: O(N) histograms instead of 19 full
    sorts (VERDICT r3 item 9 experiment).

    Errors are quantized to a 4096-level linear key (absolute key error
    <= 1.2e-4 on [0, 1]); tied pixels share the tie block's average
    Lovász gradient — the exact value/gradient of the sorted formulation
    under tie-aware telescoping, and within ~1e-4 of the f32-sort loss.
    Two passes, both MXU one-hot matmuls over pixel chunks:
      A (stop-grad) per-bucket (count, fg) histogram -> ΔJaccard/count
        coefficient table;
      B (differentiable) loss = Σ_p e_p * table[bucket(p)], checkpointed
        so the backward recomputes one-hots instead of storing them.
    """
    del class_weights
    C = num_classes
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    probs = probs.reshape(-1, C)
    labels_f = labels.reshape(-1)
    valid = _valid_mask(labels_f, C, ignore_index)
    safe = _safe_labels(labels_f, C, valid)
    validf = valid.astype(jnp.float32)
    fg = (safe[:, None] == jnp.arange(C)).astype(jnp.float32)
    errors = jnp.abs(fg - probs) * validf[:, None]

    coef, present = _lovasz_bucket_tables(errors, fg, validf,
                                          n_buckets, chunk)

    nb = n_buckets
    side = int(nb ** 0.5)
    iota = jnp.arange(side, dtype=jnp.int32)
    n = errors.shape[0]
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    err_p = jnp.pad(errors, ((0, pad), (0, 0))) if pad else errors
    err_c = err_p.reshape(n_chunks, chunk, C)
    G = coef.reshape(C, side, side)

    @jax.checkpoint
    def chunk_loss(e):
        # coef lookup as one-hot matmul: coef_p = Σ_hl ph·pl·G[h,l]
        q = jnp.clip((lax.stop_gradient(e) * (nb - 1)).astype(jnp.int32),
                     0, nb - 1)
        total = jnp.float32(0)
        for c in range(C):
            ph = (q[:, c] // side == iota[:, None]).astype(jnp.bfloat16)
            pl = (q[:, c] % side == iota[:, None]).astype(jnp.bfloat16)
            cp = jnp.einsum("hp,hl,lp->p", ph, G[c].astype(jnp.bfloat16),
                            pl, preferred_element_type=jnp.float32)
            total = total + jnp.dot(e[:, c], cp,
                                    preferred_element_type=jnp.float32)
        return total

    def body(acc, e):
        return acc + chunk_loss(e), None

    loss_sum, _ = lax.scan(body, jnp.float32(0), err_c)
    presents = present.astype(jnp.float32)
    return loss_sum / jnp.maximum(jnp.sum(presents), 1e-8)


def fused_resize_ce_spec(model, loss_name: str):
    """(loss_builder, fwd_method) for the fused resize-CE path, or
    (None, None) when not eligible. Eligible = CE-family loss on a
    resize-tail model (``LOGITS_TAIL == "resize"`` with a
    ``logits_lowres`` method) with ``ESN_TPU_FUSED_CE=1``.

    Default OFF — measured 2.4x SLOWER at 2048x1024 b8 on v5e
    (fastscnn 62.3 vs 148.8 img/s, contextnet 54.8 vs 109.7, r5 A/B
    with the fwd_method actually wired — the r4 'perf-neutral' record
    was a no-op comparison, caught by ADVICE r4): the scanned
    block-CE's temporaries and the backward through the scan cost far
    more than the full-res logits tensor the rewrite removes; XLA's
    fusion of the materialized resize+CE tail is strongly competitive.
    Collecting the measured 8.6 ms loss-tail slice
    (tools/bench_train_decomp.py probe) would need a VMEM-resident
    Pallas CE with a custom VJP; kept as an exact, tested experiment."""
    if (loss_name in ("ce", "label_smoothing")
            and getattr(model, "LOGITS_TAIL", "conv") == "resize"
            and hasattr(model, "logits_lowres")
            and os.environ.get("ESN_TPU_FUSED_CE", "0") in ("1", "2")):
        smooth = 0.1 if loss_name == "label_smoothing" else 0.0
        return partial(resize_cross_entropy, label_smoothing=smooth), \
            "logits_lowres"
    return None, None


LOSS_REGISTRY = {
    "ce": cross_entropy,
    "label_smoothing": partial(cross_entropy, label_smoothing=0.1),
    "ohem": ohem_cross_entropy,
    "focal": focal_loss,
    "lovasz": lovasz_softmax,
    "lovasz_hist": lovasz_softmax_hist,
}


def build_loss(name: str, **defaults):
    """Factory mirroring the reference's train.py loss selection [R]:
    flags --use_ohem / --use_label_smoothing / --use_lovaszsoftmax /
    --use_focal select the criterion; default is weighted CE."""
    if name not in LOSS_REGISTRY:
        raise KeyError(f"unknown loss {name!r}; options: {sorted(LOSS_REGISTRY)}")
    fn = LOSS_REGISTRY[name]
    if defaults:
        fn = partial(fn, **defaults)
    return fn
