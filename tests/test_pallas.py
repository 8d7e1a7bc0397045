"""Parity tests for the Pallas kernels (interpreter mode on CPU).

Every Pallas kernel ships with an XLA-composed fallback; these tests pin the
kernel (run through the Pallas interpreter) against that fallback, and the
fallback against the framework's plain composed ops, so a TPU run is covered
transitively (SURVEY.md §7 design stance: "Every Pallas kernel has an
XLA-composed fallback and a parity test against it").
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esn_tpu import nn
from esn_tpu.ops.pallas import dsconv as K


def _mats(rng, n, h, w, ci, co, dtype=jnp.float32):
    x = jnp.asarray(rng.randn(n, h, w, ci), dtype)
    dw = jnp.asarray(rng.randn(3, 3, ci) * 0.3, jnp.float32)
    pw = jnp.asarray(rng.randn(ci, co) * 0.2, jnp.float32)
    a1 = jnp.asarray(rng.rand(ci) + 0.5, jnp.float32)
    b1 = jnp.asarray(rng.randn(ci) * 0.1, jnp.float32)
    a2 = jnp.asarray(rng.rand(co) + 0.5, jnp.float32)
    b2 = jnp.asarray(rng.randn(co) * 0.1, jnp.float32)
    return x, dw, a1, b1, pw, a2, b2


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("hw", [(16, 16), (10, 14), (9, 15)])
def test_dsconv_interpret_matches_ref(rng, stride, hw):
    h, w = hw
    args = _mats(rng, 2, h, w, 8, 16)
    ref = K.dsconv_ref(*args, stride=stride)
    got = K.fused_dsconv(*args, stride=stride, impl="interpret")
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_dsconv_ref_matches_composed_ops(rng):
    """The fallback itself reproduces dwconv+affine+act -> pw+affine+act."""
    from esn_tpu.ops import convolution as C
    x, dw, a1, b1, pw, a2, b2 = _mats(rng, 1, 12, 12, 6, 10)
    h = C.depthwise_conv2d(x, dw[:, :, None, :], stride=1, padding=1)
    h = jnp.maximum(h * a1 + b1, 0)
    y = jnp.maximum(jnp.einsum("nhwc,cd->nhwd", h, pw) * a2 + b2, 0)
    got = K.dsconv_ref(x, dw, a1, b1, pw, a2, b2, stride=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(y),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("act", ["relu6", "none"])
def test_dsconv_acts(rng, act):
    args = _mats(rng, 1, 8, 8, 4, 8)
    ref = K.dsconv_ref(*args, stride=1, act1=act, act2=act)
    got = K.fused_dsconv(*args, stride=1, act1=act, act2=act,
                         impl="interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_dsconv_bf16(rng):
    args = _mats(rng, 1, 16, 16, 8, 8, dtype=jnp.bfloat16)
    ref = K.dsconv_ref(*args, stride=1)
    got = K.fused_dsconv(*args, stride=1, impl="interpret")
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_dsconv_grad_matches_ref(rng):
    """custom_vjp backward == gradient of the XLA reference."""
    x, dw, a1, b1, pw, a2, b2 = _mats(rng, 1, 8, 8, 4, 6)

    def loss_fused(x, dw, pw):
        y = K.fused_dsconv(x, dw, a1, b1, pw, a2, b2, stride=1, impl="xla")
        return jnp.sum(y ** 2)

    def loss_ref(x, dw, pw):
        y = K.dsconv_ref(x, dw, a1, b1, pw, a2, b2, stride=1)
        return jnp.sum(y ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, dw, pw)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, dw, pw)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fold_bn_matches_batchnorm_eval(rng):
    c = 8
    mean = jnp.asarray(rng.randn(c), jnp.float32)
    var = jnp.asarray(rng.rand(c) + 0.1, jnp.float32)
    gamma = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
    beta = jnp.asarray(rng.randn(c), jnp.float32)
    x = jnp.asarray(rng.randn(2, 4, 4, c), jnp.float32)

    bn = nn.BatchNorm(c)
    variables = {"params": {"scale": gamma, "bias": beta},
                 "stats": {"mean": mean, "var": var}}
    want = nn.apply(bn, variables, x, train=False)
    a, b = K.fold_bn(mean, var, gamma, beta, eps=bn.eps)
    np.testing.assert_allclose(np.asarray(x * a + b), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_dsconv_block_fused_branch_matches_plain(rng, monkeypatch):
    """DSConv block: env-forced fused branch == plain composed branch (eval).

    On CPU the fused branch lowers to the XLA fallback; the Pallas kernel
    itself is pinned to that fallback above, closing the parity chain.
    """
    from esn_tpu.models.blocks import DSConv

    for stride in (1, 2):
        block = DSConv(6, 12, stride=stride)
        x = jnp.asarray(rng.randn(2, 16, 16, 6), jnp.float32)
        variables = block.init(jax.random.PRNGKey(0), x)
        # make running stats non-trivial so BN folding is actually exercised
        variables["stats"]["dw"]["bn"]["mean"] = jnp.asarray(
            rng.randn(6) * 0.1, jnp.float32)
        variables["stats"]["dw"]["bn"]["var"] = jnp.asarray(
            rng.rand(6) + 0.5, jnp.float32)
        variables["stats"]["pw"]["bn"]["mean"] = jnp.asarray(
            rng.randn(12) * 0.1, jnp.float32)
        variables["stats"]["pw"]["bn"]["var"] = jnp.asarray(
            rng.rand(12) + 0.5, jnp.float32)

        monkeypatch.setenv("ESN_TPU_PALLAS", "0")
        plain = nn.apply(block, variables, x, train=False)
        monkeypatch.setenv("ESN_TPU_PALLAS", "1")
        fused = nn.apply(block, variables, x, train=False)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                                   rtol=1e-5, atol=1e-5)
