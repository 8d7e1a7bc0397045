"""model.predict (fused subpixel prediction head) must equal
argmax(model logits) EXACTLY for every model — it is the eval/predict/bench
path (train/step.py make_eval_step)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esn_tpu import nn
from esn_tpu.models import build_model
from esn_tpu.ops import argmax_lastdim

FUSED = ["erfnet", "esnet", "linknet", "sqnet", "fssnet", "enet", "espnet"]
DEFAULT = ["fastscnn", "segnet", "unet", "espnet_c"]


@pytest.mark.parametrize("name", FUSED + DEFAULT)
def test_predict_matches_argmax_of_logits(name):
    m = build_model(name, 19)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 96, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    logits = nn.apply(m, v, x)
    ref = argmax_lastdim(logits, tail=m.LOGITS_TAIL)
    got = nn.apply(m, v, x, method="predict")
    assert got.shape == ref.shape and got.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_resize2x_head_argmax_matches_unfused():
    """ops.classify.resize2x_head_argmax == argmax(resize2x(conv1x1)),
    including the jax.image.resize edge-clamp rows/cols. f32; mismatches
    allowed only at near-tie pixels (the fused path premultiplies the
    bilinear and head weights — different f32 association)."""
    from esn_tpu.ops.classify import resize2x_head_argmax
    from esn_tpu.ops.convolution import conv2d
    from esn_tpu.ops.resize import resize_bilinear
    k = jax.random.PRNGKey(3)
    y = jax.random.normal(k, (2, 12, 32, 16), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(4), (1, 1, 16, 19),
                          jnp.float32) * 0.3
    b = jax.random.normal(jax.random.PRNGKey(5), (19,), jnp.float32) * 0.1
    logits = resize_bilinear(conv2d(y, w, bias=b), (24, 64))
    ref = np.asarray(jnp.argmax(logits, -1))
    got = resize2x_head_argmax(y, w, b)
    assert got is not None and got.shape == (2, 24, 64)
    got = np.asarray(got)
    bad = got != ref
    if bad.any():
        srt = np.sort(np.asarray(logits), axis=-1)
        near_tie = (srt[..., -1] - srt[..., -2]) < 1e-4
        assert near_tie[bad].all(), \
            f"{bad.sum()} mismatches not explained by ties"
    # ineligible geometry (C does not divide 128) falls back to None
    w25 = jax.random.normal(k, (1, 1, 25, 19), jnp.float32)
    y25 = jax.random.normal(k, (1, 8, 24, 25), jnp.float32)
    assert resize2x_head_argmax(y25, w25, None) is None


def test_fpenet_predict_matches_argmax_of_logits():
    """FPENet's fused resize2x tail vs the default argmax(logits) path —
    near-tie tolerance (premultiplied weights reassociate f32 sums)."""
    m = build_model("fpenet", 19)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 96, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    logits = nn.apply(m, v, x)
    ref = np.asarray(argmax_lastdim(logits, tail=m.LOGITS_TAIL))
    got = nn.apply(m, v, x, method="predict")
    assert got.shape == ref.shape and got.dtype == jnp.int32
    got = np.asarray(got)
    bad = got != ref
    if bad.any():
        srt = np.sort(np.asarray(logits), axis=-1)
        near_tie = (srt[..., -1] - srt[..., -2]) < 1e-4
        assert near_tie[bad].all(), \
            f"{bad.sum()} mismatches not explained by ties"
