"""On-device train-time augmentation (jit-compiled, static shapes).

Reference: ``dataset/*.py :: __getitem__`` [R] — cv2 random scale (discrete
0.5..2.0 set), mean subtraction, pad-to-crop (label filled with
ignore_label), random crop, random horizontal mirror, all on forked CPU
workers. Here the whole pipeline is one XLA program on the accelerator:

- **scale-then-crop becomes crop-then-resize**: sampling a scale s and
  cropping C pixels from the scaled image == cropping C/s source pixels and
  resizing to C. Each scale in the discrete set gives a *static* source-crop
  shape, selected with ``lax.switch`` — no dynamic shapes anywhere.
- the scale is drawn **per batch** by default (branch predicate must be
  scalar under jit); crop offsets and mirror flags stay per image. This is
  an intentional distribution change vs the reference (per-image scale) —
  it trades augmentation diversity for a len(scales)-times smaller compiled
  program. ``per_image_scale=True`` (CLI ``--aug_mode reference``) restores
  the reference's per-image draw by computing every scale branch and
  selecting per image — the parity mode for mIoU reproduction (PARITY.md).
- ``scales``: DEFAULT_SCALES starts at 0.75 (0.5 halves effective source
  resolution and rarely helps the 512-1024px crops used here);
  REFERENCE_SCALES includes 0.5 per SURVEY §2.2's ~0.5-2.0x set and is the
  default in reference mode.
- resample order: the reference resamples scale-then-crop (cv2.resize the
  whole image, then crop). ``reference`` mode now does EXACTLY that — the
  scale set is discrete, so each scale's scaled shape is static and the
  whole thing stays one XLA program (r5, closes PARITY knob #5; oracle
  test vs the cv2 pipeline at every scale). The default ``batch`` mode
  keeps crop-then-resize (crop C/s source px, resize to C — same window
  distribution, cheaper, sub-pixel border difference at crop edges).
- normalization (mean subtraction, reference convention: BGR means, no std
  division) is fused into the same program.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_SCALES = (0.75, 1.0, 1.25, 1.5, 1.75, 2.0)
REFERENCE_SCALES = (0.5, 0.75, 1.0, 1.25, 1.5, 1.75, 2.0)


def normalize(images: jnp.ndarray, mean: jnp.ndarray,
              std: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    x = images.astype(jnp.float32) - jnp.asarray(mean, jnp.float32)
    if std is not None:
        x = x / jnp.asarray(std, jnp.float32)
    return x


def _batch_crop(images, labels, key, src_h, src_w):
    """Random per-image crop of static size (src_h, src_w)."""
    b, h, w, _ = images.shape
    ky, kx = jax.random.split(key)
    y0 = jax.random.randint(ky, (b,), 0, h - src_h + 1)
    x0 = jax.random.randint(kx, (b,), 0, w - src_w + 1)

    def crop_one(img, lab, y, x):
        ic = jax.lax.dynamic_slice(img, (y, x, 0), (src_h, src_w, img.shape[-1]))
        lc = jax.lax.dynamic_slice(lab, (y, x), (src_h, src_w))
        return ic, lc

    return jax.vmap(crop_one)(images, labels, y0, x0)


def _resize_pair(images, labels, hw):
    from ..ops.resize import resize_nearest_cv2
    b = images.shape[0]
    oh, ow = hw
    if images.shape[1:3] != (oh, ow):
        # antialias=False: cv2.INTER_LINEAR samples a plain 2-tap kernel
        # on downscale too (the s<1 scale branches minify) — see
        # ops/resize.py r4 note. Labels take the cv2 INTER_NEAREST index
        # convention exactly (r5: jax 'nearest' disagrees with cv2 at
        # most ratios — PARITY knob #5 family).
        images = jax.image.resize(images, (b, oh, ow, images.shape[-1]),
                                  method="bilinear", antialias=False)
        labels = resize_nearest_cv2(labels, (oh, ow))
    return images, labels


def scale_then_crop(images, labels, key, *, scale: float,
                    crop_hw: Tuple[int, int], ignore_label: int):
    """One exact reference-order branch: resize the whole image by
    ``scale`` (cv2 size convention: round half away from zero), pad to at
    least the crop (0 on images — post-normalize, like the reference's
    copyMakeBorder after mean subtraction — ignore on labels), uniform
    random crop. Pixel-exact vs the cv2 pipeline
    (tests/test_augment_modes.py oracle)."""
    from ..ops.resize import resize_nearest_cv2
    ch, cw = crop_hw
    b, h, w = labels.shape
    hs = int(np.floor(h * scale + 0.5))
    ws = int(np.floor(w * scale + 0.5))
    if (hs, ws) != (h, w):
        images = jax.image.resize(images, (b, hs, ws, images.shape[-1]),
                                  method="bilinear", antialias=False)
        labels = resize_nearest_cv2(labels, (hs, ws))
    pad_h, pad_w = max(ch - hs, 0), max(cw - ws, 0)
    if pad_h or pad_w:
        images = jnp.pad(images, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad_h), (0, pad_w)),
                         constant_values=ignore_label)
    ic, lc = _batch_crop(images, labels, key, ch, cw)
    return ic, lc.astype(jnp.int32)


def make_augment_fn(*, crop_hw: Tuple[int, int],
                    source_hw: Tuple[int, int],
                    mean: np.ndarray,
                    std: Optional[np.ndarray] = None,
                    ignore_label: int = 255,
                    scales: Optional[Sequence[float]] = None,
                    random_scale: bool = True,
                    random_mirror: bool = True,
                    per_image_scale: bool = False):
    """Build ``augment(rng, images_u8, labels) -> (images_f32, labels)``.

    Output is always (B, crop_h, crop_w, 3) float32 / (B, crop_h, crop_w)
    int32 — static regardless of the sampled scale.

    ``per_image_scale=True`` is the reference-faithful mode: each image
    draws its own scale (reference __getitem__ [R: dataset/*.py]). Under
    jit this computes every scale branch for the whole batch and selects
    per image — ~len(scales)x the augmentation FLOPs, still cheap next to
    a train step; use for mIoU-parity runs (PARITY.md).
    """
    ch, cw = crop_hw
    if scales is None:
        scales = REFERENCE_SCALES if per_image_scale else DEFAULT_SCALES
    sh_list = [1.0] if not random_scale else list(scales)
    # source-crop size per scale (crop C at scale s == crop round(C/s) source px)
    src_sizes = [(int(round(ch / s)), int(round(cw / s))) for s in sh_list]

    def branch_fn(src_h, src_w):
        """crop-then-resize (default `batch` mode): crop C/s source pixels,
        resize to C. Same window distribution as the reference, different
        bilinear association at crop borders (PARITY #5 residual; the
        reference mode below closes it)."""
        H, W = source_hw

        def fn(images, labels, key):
            pad_h, pad_w = max(src_h - H, 0), max(src_w - W, 0)
            if pad_h or pad_w:
                images = jnp.pad(images, ((0, 0), (0, pad_h), (0, pad_w),
                                          (0, 0)))
                labels = jnp.pad(labels, ((0, 0), (0, pad_h), (0, pad_w)),
                                 constant_values=ignore_label)
            ic, lc = _batch_crop(images, labels, key, src_h, src_w)
            ic, lc = _resize_pair(ic, lc, (ch, cw))
            return ic, lc.astype(jnp.int32)
        return fn

    def branch_fn_exact(s):
        """scale-THEN-crop, the reference's exact resample order
        [R: dataset/*.py __getitem__]: cv2.resize the WHOLE image to
        (round(H*s), round(W*s)) (INTER_LINEAR image / INTER_NEAREST
        label), pad to >= crop, random crop. Every scale in the discrete
        set gives a STATIC scaled shape, so this stays one XLA program —
        the 'seven static per-scale resize graphs' closing of PARITY
        knob #5 (r5). Costs a full-image resize per branch; reference
        mode runs all branches anyway (per-image scale draw)."""
        return partial(scale_then_crop, scale=s, crop_hw=(ch, cw),
                       ignore_label=ignore_label)

    exact = per_image_scale  # reference mode IS the parity mode
    branches = ([branch_fn_exact(s) for s in sh_list] if exact
                else [branch_fn(h_, w_) for (h_, w_) in src_sizes])

    @jax.jit
    def augment(rng, images, labels):
        assert images.shape[1:3] == tuple(source_hw), \
            f"expected source {source_hw}, got {images.shape}"
        k_scale, k_crop, k_mirror = jax.random.split(rng, 3)
        x = normalize(images, mean, std)
        labels = labels.astype(jnp.int32)
        if len(branches) == 1:
            x, y = branches[0](x, labels, k_crop)
        elif per_image_scale:
            # reference-faithful: per-image scale. All branches run (each
            # with independent crop offsets drawn for ITS valid range),
            # then each image keeps its drawn branch.
            b = x.shape[0]
            idx = jax.random.randint(k_scale, (b,), 0, len(branches))
            outs = [br(x, labels, jax.random.fold_in(k_crop, k))
                    for k, br in enumerate(branches)]
            xs = jnp.stack([o[0] for o in outs])   # (K, B, ch, cw, 3)
            ys = jnp.stack([o[1] for o in outs])   # (K, B, ch, cw)
            row = jnp.arange(b)
            x, y = xs[idx, row], ys[idx, row]
        else:
            idx = jax.random.randint(k_scale, (), 0, len(branches))
            x, y = jax.lax.switch(idx, branches, x, labels, k_crop)
        if random_mirror:
            flip = jax.random.bernoulli(k_mirror, 0.5, (x.shape[0],))
            x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
            y = jnp.where(flip[:, None, None], y[:, :, ::-1], y)
        return x, y

    return augment


def make_eval_transform(*, mean: np.ndarray, std: Optional[np.ndarray] = None,
                        resize_hw: Optional[Tuple[int, int]] = None):
    """Val/test-time device transform: normalize (+ optional fixed resize)."""

    @jax.jit
    def transform(images):
        x = normalize(images, mean, std)
        if resize_hw is not None:
            b = x.shape[0]
            x = jax.image.resize(
                x, (b, resize_hw[0], resize_hw[1], x.shape[-1]),
                method="bilinear", antialias=False)
        return x

    return transform
