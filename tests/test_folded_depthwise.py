"""Parity: folded depthwise conv and the folded CGBlock path vs plain XLA.

The folded forms are exact re-associations of the same math (ops/folding.py
folded_depthwise_conv; models/cgnet.py CGBlock._folded) — f32 CPU tolerance
covers only reduction-order differences (BN moments, GAP)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esn_tpu import nn
from esn_tpu.ops import convolution as C
from esn_tpu.ops import folding


@pytest.mark.parametrize("f,ch,d,k", [
    (2, 64, 1, (3, 3)),    # CGNet stage3 loc
    (2, 64, 4, (3, 3)),    # CGNet stage3 sur (f | d: uniform-slot path)
    (4, 32, 1, (3, 3)),    # CGNet stage2 loc
    (4, 32, 2, (3, 3)),    # CGNet stage2 sur (mixed: 2 % 4 != 0)
    (2, 48, 2, (3, 1)),    # DABNet-style asymmetric depthwise, H-only
    (2, 48, 2, (1, 3)),    # asymmetric, W-only
])
def test_folded_depthwise_matches_conv(rng, f, ch, d, k):
    b, h, w = 2, 8, 16
    kh, kw = k
    x = jnp.asarray(rng.randn(b, h, w, ch).astype(np.float32))
    wgt = jnp.asarray(rng.randn(kh, kw, ch).astype(np.float32) * 0.3)
    pad = (d * (kh - 1) // 2, d * (kw - 1) // 2)
    # oracle: grouped conv_general_dilated, HWIO (kh, kw, 1, ch)
    ref = C.conv2d(x, wgt[:, :, None, :], stride=(1, 1),
                   padding=pad, dilation=(d, d), groups=ch)
    got = folding.unfold_w(
        folding.folded_depthwise_conv(folding.fold_w(x, f), wgt, f,
                                      dilation=(d, d), padding=pad), f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_folded_depthwise_bias(rng):
    f, ch = 2, 64
    x = jnp.asarray(rng.randn(1, 4, 8, ch).astype(np.float32))
    wgt = jnp.asarray(rng.randn(3, 3, ch).astype(np.float32))
    bias = jnp.asarray(rng.randn(ch).astype(np.float32))
    ref = C.conv2d(x, wgt[:, :, None, :], stride=(1, 1), padding=(1, 1),
                   dilation=(1, 1), groups=ch) + bias
    got = folding.unfold_w(
        folding.folded_depthwise_conv(folding.fold_w(x, f), wgt, f,
                                      padding=(1, 1), bias=bias), f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("train", [False, True])
@pytest.mark.parametrize("ch,d,w", [(128, 4, 32), (64, 2, 32)])
def test_cgblock_folded_matches_plain(rng, train, ch, d, w):
    from esn_tpu.models.cgnet import CGBlock
    block = CGBlock(ch, d, reduction=8)
    x = jnp.asarray(rng.randn(2, 8, w, ch).astype(np.float32))
    variables = block.init(jax.random.PRNGKey(0), x)

    def run(fold_on):
        os.environ["ESN_TPU_FOLD_DW"] = "1" if fold_on else "0"
        try:
            return nn.apply(block, variables, x, train=train,
                            mutable=train)
        finally:
            os.environ.pop("ESN_TPU_FOLD_DW", None)

    if train:
        (y0, st0), (y1, st1) = run(False), run(True)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=2e-4, atol=2e-4)
        for (p0, a0), (p1, a1) in zip(
                jax.tree_util.tree_flatten_with_path(st0)[0],
                jax.tree_util.tree_flatten_with_path(st1)[0]):
            assert p0 == p1
            np.testing.assert_allclose(np.asarray(a1), np.asarray(a0),
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=str(p0))
    else:
        y0, y1 = run(False), run(True)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("train", [False, True])
@pytest.mark.parametrize("ch,d,w", [(128, 8, 32), (64, 2, 32)])
def test_dabmodule_folded_matches_plain(rng, train, ch, d, w):
    from esn_tpu.models.dabnet import DABModule
    block = DABModule(ch, d)
    x = jnp.asarray(rng.randn(2, 8, w, ch).astype(np.float32))
    variables = block.init(jax.random.PRNGKey(0), x)

    def run(fold_on):
        os.environ["ESN_TPU_FOLD_DW"] = "1" if fold_on else "0"
        try:
            return nn.apply(block, variables, x, train=train, mutable=train)
        finally:
            os.environ.pop("ESN_TPU_FOLD_DW", None)

    if train:
        (y0, st0), (y1, st1) = run(False), run(True)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=2e-4, atol=2e-4)
        for (p0, a0), (p1, a1) in zip(
                jax.tree_util.tree_flatten_with_path(st0)[0],
                jax.tree_util.tree_flatten_with_path(st1)[0]):
            assert p0 == p1
            np.testing.assert_allclose(np.asarray(a1), np.asarray(a0),
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=str(p0))
    else:
        y0, y1 = run(False), run(True)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=2e-4, atol=2e-4)


def test_dabnet_full_folded_matches_plain(rng):
    from esn_tpu.models import build_model
    model = build_model("dabnet", 19)
    x = jnp.asarray(rng.randn(1, 64, 128, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)

    def run(fold_on):
        os.environ["ESN_TPU_FOLD_DW"] = "1" if fold_on else "0"
        try:
            return nn.apply(model, variables, x, train=False)
        finally:
            os.environ.pop("ESN_TPU_FOLD_DW", None)

    np.testing.assert_allclose(np.asarray(run(True)), np.asarray(run(False)),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("train", [False, True])
@pytest.mark.parametrize("ch,t,w", [(64, 4, 32), (16, 1, 64)])
def test_fpeblock_folded_matches_plain(rng, train, ch, t, w):
    from esn_tpu.models.fpenet import FPEBlock
    block = FPEBlock(ch, ch, t=t)
    x = jnp.asarray(rng.randn(2, 8, w, ch).astype(np.float32))
    variables = block.init(jax.random.PRNGKey(0), x)

    def run(fold_on):
        os.environ["ESN_TPU_FOLD_DW"] = "1" if fold_on else "0"
        try:
            return nn.apply(block, variables, x, train=train, mutable=train)
        finally:
            os.environ.pop("ESN_TPU_FOLD_DW", None)

    if train:
        (y0, st0), (y1, st1) = run(False), run(True)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=2e-4, atol=2e-4)
        for (p0, a0), (p1, a1) in zip(
                jax.tree_util.tree_flatten_with_path(st0)[0],
                jax.tree_util.tree_flatten_with_path(st1)[0]):
            assert p0 == p1
            np.testing.assert_allclose(np.asarray(a1), np.asarray(a0),
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=str(p0))
    else:
        y0, y1 = run(False), run(True)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=2e-4, atol=2e-4)


def test_fpenet_full_folded_matches_plain(rng):
    from esn_tpu.models import build_model
    model = build_model("fpenet", 19)
    x = jnp.asarray(rng.randn(1, 64, 128, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)

    def run(fold_on):
        os.environ["ESN_TPU_FOLD_DW"] = "1" if fold_on else "0"
        try:
            return nn.apply(model, variables, x, train=False)
        finally:
            os.environ.pop("ESN_TPU_FOLD_DW", None)

    np.testing.assert_allclose(np.asarray(run(True)), np.asarray(run(False)),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("train", [False, True])
@pytest.mark.parametrize("ch,w", [(64, 32), (128, 32)])
def test_eesp_folded_matches_plain(rng, train, ch, w):
    from esn_tpu.models.espnetv2 import EESP
    block = EESP(ch, ch)
    x = jnp.asarray(rng.randn(2, 8, w, ch).astype(np.float32))
    variables = block.init(jax.random.PRNGKey(0), x)

    def run(fold_on):
        os.environ["ESN_TPU_FOLD_DW"] = "1" if fold_on else "0"
        try:
            return nn.apply(block, variables, x, train=train, mutable=train)
        finally:
            os.environ.pop("ESN_TPU_FOLD_DW", None)

    if train:
        (y0, st0), (y1, st1) = run(False), run(True)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=2e-4, atol=2e-4)
        for (p0, a0), (p1, a1) in zip(
                jax.tree_util.tree_flatten_with_path(st0)[0],
                jax.tree_util.tree_flatten_with_path(st1)[0]):
            assert p0 == p1
            np.testing.assert_allclose(np.asarray(a1), np.asarray(a0),
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=str(p0))
    else:
        y0, y1 = run(False), run(True)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=2e-4, atol=2e-4)


def test_espnetv2_full_folded_matches_plain(rng):
    from esn_tpu.models import build_model
    model = build_model("espnetv2", 19)
    x = jnp.asarray(rng.randn(1, 64, 128, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)

    def run(fold_on):
        os.environ["ESN_TPU_FOLD_DW"] = "1" if fold_on else "0"
        try:
            return nn.apply(model, variables, x, train=False)
        finally:
            os.environ.pop("ESN_TPU_FOLD_DW", None)

    np.testing.assert_allclose(np.asarray(run(True)), np.asarray(run(False)),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("in_ch,out_ch,stride,k", [
    (64, 64, 1, 5), (19, 64, 2, 5), (38, 38, 1, 4)])
def test_esp_fused_hff_matches_plain(rng, in_ch, out_ch, stride, k):
    from esn_tpu.models.espnet import ESPModule
    block = ESPModule(in_ch, out_ch, stride=stride, k=k,
                      residual=(in_ch == out_ch))
    x = jnp.asarray(rng.randn(2, 16, 32, in_ch).astype(np.float32))
    variables = block.init(jax.random.PRNGKey(0), x)

    def run(on):
        os.environ["ESN_TPU_ESP_FUSED_HFF"] = "1" if on else "0"
        try:
            return nn.apply(block, variables, x, train=False)
        finally:
            os.environ.pop("ESN_TPU_ESP_FUSED_HFF", None)

    np.testing.assert_allclose(np.asarray(run(True)), np.asarray(run(False)),
                               rtol=1e-4, atol=1e-4)


def test_espnet_c_full_fused_hff_matches_plain(rng):
    """f64 so the check is EXACT: at f32 the random-init (unnormalized)
    10-module stack amplifies benign reassociation rounding to ~1e-1,
    which can't distinguish a rewrite bug from noise. In f64 the fused
    HFF + reduce-fold rewrites agree to ~1e-10 (they are the same
    linear algebra re-associated)."""
    from esn_tpu.models import build_model
    model = build_model("espnet_c", 19)
    x32 = jnp.asarray(rng.randn(1, 64, 128, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x32)
    jax.config.update("jax_enable_x64", True)
    try:
        v64 = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64) if a.dtype == jnp.float32
            else a, variables)
        x = x32.astype(jnp.float64)

        def run(on):
            os.environ["ESN_TPU_ESP_FUSED_HFF"] = "1" if on else "0"
            try:
                return nn.apply(model, v64, x, train=False)
            finally:
                os.environ.pop("ESN_TPU_ESP_FUSED_HFF", None)

        np.testing.assert_allclose(np.asarray(run(True)),
                                   np.asarray(run(False)),
                                   rtol=1e-9, atol=1e-9)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_cgnet_full_folded_matches_plain(rng):
    """End-to-end CGNet forward, folded vs not, eval mode."""
    from esn_tpu.models import build_model
    model = build_model("cgnet", 19)
    x = jnp.asarray(rng.randn(1, 64, 128, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)

    def run(fold_on):
        os.environ["ESN_TPU_FOLD_DW"] = "1" if fold_on else "0"
        try:
            return nn.apply(model, variables, x, train=False)
        finally:
            os.environ.pop("ESN_TPU_FOLD_DW", None)

    np.testing.assert_allclose(np.asarray(run(True)), np.asarray(run(False)),
                               rtol=2e-4, atol=2e-4)


def test_esp_fold_reduce_matches_unfolded(rng):
    """Reduce-fold (1x1 reduce composed into branch kernels) is exact."""
    from esn_tpu.models.espnet import ESPModule
    block = ESPModule(64, 64, k=5, residual=True)
    x = jnp.asarray(rng.randn(2, 16, 32, 64).astype(np.float32))
    variables = block.init(jax.random.PRNGKey(0), x)

    def run(fold):
        os.environ["ESN_TPU_ESP_FUSED_HFF"] = "1"
        os.environ["ESN_TPU_ESP_FOLD_REDUCE"] = "1" if fold else "0"
        try:
            return nn.apply(block, variables, x, train=False)
        finally:
            os.environ.pop("ESN_TPU_ESP_FUSED_HFF", None)
            os.environ.pop("ESN_TPU_ESP_FOLD_REDUCE", None)

    np.testing.assert_allclose(np.asarray(run(True)), np.asarray(run(False)),
                               rtol=1e-4, atol=1e-4)
