"""Reference-faithful augmentation mode (VERDICT r1 item 7).

The effective scale of an augmented image is recovered from a coordinate
ramp: image content = source column index, so after crop-at-scale-s the
mean step between adjacent output columns is 1/s (crop C at scale s ==
crop C/s source px resized to C).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esn_tpu.data.augment import (DEFAULT_SCALES, REFERENCE_SCALES,
                                  make_augment_fn)

SRC = (64, 128)
CROP = (32, 32)
B = 8


def _ramp_batch():
    img = np.tile(np.arange(SRC[1], dtype=np.float32)[None, :, None],
                  (SRC[0], 1, 3))
    images = np.tile(img[None], (B, 1, 1, 1))
    labels = np.zeros((B,) + SRC, np.int32)
    return jnp.asarray(images), jnp.asarray(labels)


def _recover_scales(x):
    """Per-image effective scale from the column-ramp step (mirror-proof)."""
    step = jnp.abs(jnp.diff(x[..., 0], axis=-1)).mean(axis=(1, 2))
    return 1.0 / np.asarray(step)


def _aug(per_image):
    return make_augment_fn(
        crop_hw=CROP, source_hw=SRC, mean=np.zeros(3, np.float32),
        random_mirror=False, per_image_scale=per_image)


def test_batch_mode_one_scale_per_batch():
    aug = _aug(False)
    x, _ = aug(jax.random.PRNGKey(0), *_ramp_batch())
    s = _recover_scales(x)
    assert np.allclose(s, s[0], rtol=0.08)  # whole batch shares one scale
    # and that scale is from the default set
    assert min(abs(s[0] - t) / t for t in DEFAULT_SCALES) < 0.08


def test_reference_mode_per_image_scales_cover_the_reference_set():
    aug = _aug(True)
    images, labels = _ramp_batch()
    seen = []
    for i in range(24):
        x, y = aug(jax.random.PRNGKey(i), images, labels)
        assert x.shape == (B,) + CROP + (3,) and y.shape == (B,) + CROP
        seen.append(_recover_scales(x))
    seen = np.concatenate(seen)  # 192 draws
    # per-image: most batches mix at least 3 distinct scales
    per_batch_distinct = [
        len({int(round(np.log(v) * 8)) for v in batch})
        for batch in np.split(seen, 24)]
    assert np.mean(per_batch_distinct) > 2.5
    # every scale in the reference set (incl. 0.5) is actually drawn
    for t in REFERENCE_SCALES:
        hits = np.sum(np.abs(seen - t) / t < 0.08)
        assert hits > 0, f"scale {t} never drawn in 192 samples"
    # roughly uniform: no scale takes more than half the draws
    for t in REFERENCE_SCALES:
        hits = np.sum(np.abs(seen - t) / t < 0.08)
        assert hits < len(seen) / 2


def test_reference_mode_labels_follow_their_image():
    """Label must be cropped/resized with the SAME branch as its image."""
    aug = make_augment_fn(
        crop_hw=CROP, source_hw=SRC, mean=np.zeros(3, np.float32),
        random_mirror=False, per_image_scale=True)
    images = jnp.asarray(np.tile(
        np.arange(SRC[1], dtype=np.float32)[None, None, :, None],
        (B, SRC[0], 1, 3)))
    # label = source column index too: after identical geometry, label value
    # must track the image channel value within nearest-vs-bilinear error
    labels = jnp.asarray(np.tile(
        np.arange(SRC[1], dtype=np.int32)[None, None, :], (B, SRC[0], 1)))
    x, y = aug(jax.random.PRNGKey(3), images, labels)
    err = np.abs(np.asarray(x[..., 0]) - np.asarray(y))
    assert err.max() <= 2.0  # nearest label vs bilinear image: <= one source px
