"""nn.ScanChain: scanned repeated blocks vs the unrolled Sequential path.

The scan body runs the same per-block math (XLA may re-fuse, so parity is
float-epsilon, not bitwise), train-mode BN stat updates must land on the
same per-block paths, and checkpoints must be interchangeable."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esn_tpu import nn
from esn_tpu.models.cgnet import CGBlock



def _mk(n=4, ch=32):
    chain = nn.ScanChain(CGBlock(ch, 2, 8), n)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 24, ch),
                          jnp.float32)
    v = chain.init(jax.random.PRNGKey(0), x)
    return chain, v, x


def test_scan_matches_unrolled_eval():
    chain, v, x = _mk()
    y_scan = nn.apply(chain, v, x)
    os.environ["ESN_TPU_SCAN_CHAIN"] = "0"
    try:
        y_unroll = nn.apply(chain, v, x)
    finally:
        del os.environ["ESN_TPU_SCAN_CHAIN"]
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_unroll),
                               rtol=1e-5, atol=1e-5)


def test_scan_matches_unrolled_train_stats():
    chain, v, x = _mk()
    y1, nv1 = nn.apply(chain, v, x, train=True, mutable=True)
    os.environ["ESN_TPU_SCAN_CHAIN"] = "0"
    try:
        y2, nv2 = nn.apply(chain, v, x, train=True, mutable=True)
    finally:
        del os.environ["ESN_TPU_SCAN_CHAIN"]
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-5, atol=1e-5)
    leaves1 = jax.tree_util.tree_leaves_with_path(nv1["stats"])
    leaves2 = dict(jax.tree_util.tree_leaves_with_path(nv2["stats"]))
    assert leaves1 and len(leaves1) == len(leaves2)
    for path, leaf in leaves1:
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(leaves2[path]),
                                   rtol=1e-5, atol=1e-7)


def test_variables_layout_matches_sequential():
    n, ch = 3, 32
    x = jnp.zeros((1, 8, 8, ch), jnp.float32)
    chain = nn.ScanChain(CGBlock(ch, 2, 8), n)
    seq = nn.Sequential(*[CGBlock(ch, 2, 8) for _ in range(n)])
    vc = chain.init(jax.random.PRNGKey(0), x)
    vs = seq.init(jax.random.PRNGKey(0), x)
    pc = jax.tree_util.tree_structure(vc)
    ps = jax.tree_util.tree_structure(vs)
    assert pc == ps
    # and a Sequential checkpoint drives the scanned module unchanged
    y_seq = nn.apply(seq, vs, jnp.ones_like(x))
    y_chain = nn.apply(chain, vs, jnp.ones_like(x))
    np.testing.assert_allclose(np.asarray(y_seq), np.asarray(y_chain),
                               rtol=1e-5, atol=1e-5)


def test_scanned_esp_module_matches_unrolled():
    # ESPNet-C's level2/level3 run ESP modules under ScanChain; the k-way
    # dilated pyramid + fused HFF must survive the scan body (param
    # subtrees sliced per step feed the tiled-kernel construction)
    from esn_tpu.models.espnet import ESPModule
    ch, n = 64, 3
    chain = nn.ScanChain(ESPModule(ch, ch, fused_hff=True), n)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 24, ch),
                          jnp.float32)
    v = chain.init(jax.random.PRNGKey(0), x)
    y_scan = nn.apply(chain, v, x)
    os.environ["ESN_TPU_SCAN_CHAIN"] = "0"
    try:
        y_unroll = nn.apply(chain, v, x)
    finally:
        del os.environ["ESN_TPU_SCAN_CHAIN"]
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_unroll),
                               rtol=1e-5, atol=1e-5)
    # and the non-fused path under scan agrees with the fused one
    os.environ["ESN_TPU_ESP_FUSED_HFF"] = "0"
    try:
        y_plain = nn.apply(chain, v, x)
    finally:
        del os.environ["ESN_TPU_ESP_FUSED_HFF"]
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_plain),
                               rtol=1e-4, atol=1e-4)


def test_scanned_pattern_body_matches_unrolled():
    # ERFNet's level-2 stage scans a Sequential PATTERN of four nb1d
    # blocks with different static dilations, repeated twice — the body
    # is structurally identical across repeats, the dilations live in the
    # body's static config
    from esn_tpu.models.blocks import NonBottleneck1d
    body = nn.Sequential(*[NonBottleneck1d(32, dilation=d)
                           for d in (2, 4, 8, 16)])
    chain = nn.ScanChain(body, 2)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 32),
                          jnp.float32)
    v = chain.init(jax.random.PRNGKey(0), x)
    y_scan, nv1 = nn.apply(chain, v, x, train=True, mutable=True)
    y_eval = nn.apply(chain, v, x)
    os.environ["ESN_TPU_SCAN_CHAIN"] = "0"
    try:
        y_unroll, nv2 = nn.apply(chain, v, x, train=True, mutable=True)
        y_eval_u = nn.apply(chain, v, x)
    finally:
        del os.environ["ESN_TPU_SCAN_CHAIN"]
    # train-mode BN batch stats re-fuse under scan: float-epsilon drift
    # accumulates over the 8 effective blocks (~7e-5 measured on CPU)
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_unroll),
                               rtol=1e-3, atol=3e-4)
    np.testing.assert_allclose(np.asarray(y_eval), np.asarray(y_eval_u),
                               rtol=1e-5, atol=1e-5)
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_leaves_with_path(nv1["stats"]),
            jax.tree_util.tree_leaves_with_path(nv2["stats"])):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-3, atol=1e-6, err_msg=str(pa))


def test_eval_unroll_flag():
    # eval_unroll=True unrolls inference (measured faster: no scan-carry
    # HBM round trips) while training stays scanned; both must agree with
    # the forced-scan path, and ESN_TPU_SCAN_CHAIN=1 overrides the flag
    n, ch = 3, 32
    chain = nn.ScanChain(CGBlock(ch, 2, 8), n, eval_unroll=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 24, ch),
                          jnp.float32)
    v = chain.init(jax.random.PRNGKey(0), x)
    y_eval = nn.apply(chain, v, x)          # default eval: unrolled
    y_train, nv1 = nn.apply(chain, v, x, train=True, mutable=True)
    os.environ["ESN_TPU_SCAN_CHAIN"] = "1"  # force scan everywhere
    try:
        y_eval_s = nn.apply(chain, v, x)
        y_train_s, nv2 = nn.apply(chain, v, x, train=True, mutable=True)
    finally:
        del os.environ["ESN_TPU_SCAN_CHAIN"]
    np.testing.assert_allclose(np.asarray(y_eval), np.asarray(y_eval_s),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_train), np.asarray(y_train_s),
                               rtol=1e-5, atol=1e-5)
    leaves1 = jax.tree_util.tree_leaves_with_path(nv1["stats"])
    leaves2 = dict(jax.tree_util.tree_leaves_with_path(nv2["stats"]))
    for path, leaf in leaves1:
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(leaves2[path]),
                                   rtol=1e-5, atol=1e-7)


def test_scan_under_jit_and_grad():
    chain, v, x = _mk(n=3)

    def loss(params):
        return jnp.sum(nn.apply(chain, {**v, "params": params}, x) ** 2)

    g_scan = jax.jit(jax.grad(loss))(v["params"])
    os.environ["ESN_TPU_SCAN_CHAIN"] = "0"
    try:
        g_unroll = jax.grad(loss)(v["params"])
    finally:
        del os.environ["ESN_TPU_SCAN_CHAIN"]
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_leaves_with_path(g_scan),
            jax.tree_util.tree_leaves_with_path(g_unroll)):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=5e-4, atol=5e-5)
