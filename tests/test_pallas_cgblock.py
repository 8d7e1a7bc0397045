"""Fused CG-block kernel (ops/pallas/cgblock.py): interpreter-mode Pallas
vs the XLA reference vs the legacy unfused block, forward and gradients."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esn_tpu import nn
from esn_tpu.models.cgnet import CGBlock
from esn_tpu.ops.pallas.cgblock import cgblock_pre_ref, fused_cgblock_pre



def _params(key, c, d):
    half = c // 2
    ks = jax.random.split(key, 8)
    return dict(
        w1=jax.random.normal(ks[0], (c, half), jnp.float32) * 0.3,
        a1=jax.random.normal(ks[1], (half,), jnp.float32) * 0.1 + 1.0,
        b1=jax.random.normal(ks[2], (half,), jnp.float32) * 0.1,
        p1=jax.random.uniform(ks[3], (half,), jnp.float32, 0.1, 0.4),
        dwl=jax.random.normal(ks[4], (3, 3, half), jnp.float32) * 0.3,
        dws=jax.random.normal(ks[5], (3, 3, half), jnp.float32) * 0.3,
        a2=jax.random.normal(ks[6], (c,), jnp.float32) * 0.1 + 1.0,
        b2=jax.random.normal(ks[7], (c,), jnp.float32) * 0.1,
        p2=jnp.full((c,), 0.25, jnp.float32),
    )


@pytest.mark.parametrize("c,d,h,w", [(64, 2, 32, 48), (128, 4, 40, 64),
                                     (64, 2, 30, 48)])
def test_interpret_matches_ref(c, d, h, w):
    p = _params(jax.random.PRNGKey(0), c, d)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, h, w, c), jnp.float32)
    j_ref = cgblock_pre_ref(x, **p, d=d)
    s_ref = jnp.sum(j_ref.astype(jnp.float32), axis=(1, 2))
    args = (x, p["w1"], p["a1"], p["b1"], p["p1"], p["dwl"], p["dws"],
            p["a2"], p["b2"], p["p2"])
    j_k, s_k = fused_cgblock_pre(*args, d=d, impl="interpret")
    np.testing.assert_allclose(np.asarray(j_k), np.asarray(j_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_ref),
                               rtol=2e-4, atol=2e-3)


def test_interpret_h_not_divisible_falls_back():
    # h=34 has no divisor tile with window inside the image except th=1/2;
    # whatever the picker does, output must still match the reference
    c, d = 64, 2
    p = _params(jax.random.PRNGKey(0), c, d)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 34, 48, c),
                          jnp.float32)
    j_ref = cgblock_pre_ref(x, **p, d=d)
    j_k, _ = fused_cgblock_pre(
        x, p["w1"], p["a1"], p["b1"], p["p1"], p["dwl"], p["dws"],
        p["a2"], p["b2"], p["p2"], d=d, impl="interpret")
    np.testing.assert_allclose(np.asarray(j_k), np.asarray(j_ref),
                               rtol=2e-5, atol=2e-5)


def test_cgblock_fused_eval_matches_legacy():
    blk = CGBlock(64, dilation=2, reduction=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 48, 64),
                          jnp.float32)
    v = blk.init(jax.random.PRNGKey(1), x)
    # make running stats non-trivial so the eval affine is exercised
    v["stats"] = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jnp.arange(a.size, dtype=a.dtype), v["stats"])
    os.environ["ESN_TPU_FUSED_CG"] = "1"
    try:
        y_fused = nn.apply(blk, v, x)
    finally:
        del os.environ["ESN_TPU_FUSED_CG"]
    y_plain = nn.apply(blk, v, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_plain),
                               rtol=1e-4, atol=1e-4)


def test_fused_grad_matches_legacy():
    blk = CGBlock(64, dilation=2, reduction=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 24, 64),
                          jnp.float32)
    v = blk.init(jax.random.PRNGKey(1), x)

    def loss(params, fused):
        env = {"ESN_TPU_FUSED_CG": "1"} if fused else {}
        old = dict(os.environ)
        os.environ.update(env)
        try:
            y = nn.apply(blk, {**v, "params": params}, x)
        finally:
            os.environ.clear()
            os.environ.update(old)
        return jnp.sum(y ** 2)

    gf = jax.grad(lambda p: loss(p, True))(v["params"])
    gp = jax.grad(lambda p: loss(p, False))(v["params"])
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_leaves_with_path(gf),
            jax.tree_util.tree_leaves_with_path(gp)):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-3, atol=1e-4, err_msg=str(pa))
