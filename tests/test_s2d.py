"""Space-to-depth stem lowering: exact parity with the plain stride-2 conv
(forward AND gradients), plus the phase-max pool identity. (Round-2 perf
item: kills the 3->128-lane stem padding waste; ops/s2d.py.)
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esn_tpu.ops import convolution as C
from esn_tpu.ops import pooling as P
from esn_tpu.ops import s2d as S


@pytest.mark.parametrize("k,p,cin,cout", [
    (3, 1, 3, 13),    # ENet/ERFNet/FastSCNN stem geometry
    (7, 3, 3, 64),    # LinkNet stem
    (2, 0, 3, 8),     # k2s2p0
    (3, 1, 8, 16),    # upper channel bound
])
def test_s2d_conv_matches_plain(k, p, cin, cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 24, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, cin, cout).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(cout).astype(np.float32))
    assert S.s2d_eligible(x.shape, w.shape, (2, 2), (p, p), (1, 1), 1)
    ref = C.conv2d(x, w, stride=2, padding=p, bias=b)
    got = S.s2d_conv2d(x, w, stride=(2, 2), padding=(p, p), bias=b)
    assert got.shape == ref.shape == (2, 8, 12, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_s2d_conv_gradients_match():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 12, 16, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 13).astype(np.float32) * 0.1)

    def loss_plain(w_, x_):
        return jnp.sum(jnp.sin(C.conv2d(x_, w_, stride=2, padding=1)))

    def loss_s2d(w_, x_):
        return jnp.sum(jnp.sin(
            S.s2d_conv2d(x_, w_, stride=(2, 2), padding=(1, 1))))

    gw_ref, gx_ref = jax.grad(loss_plain, argnums=(0, 1))(w, x)
    gw, gx = jax.grad(loss_s2d, argnums=(0, 1))(w, x)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-5)


def test_s2d_eligibility_gates():
    w3 = jnp.zeros((3, 3, 3, 8))
    ok = lambda shape, w, s=(2, 2), p=(1, 1), d=(1, 1), g=1: \
        S.s2d_eligible(shape, w.shape, s, p, d, g)
    assert ok((1, 16, 16, 3), w3)
    assert not ok((1, 15, 16, 3), w3)            # odd H
    assert not ok((1, 16, 16, 16), jnp.zeros((3, 3, 16, 8)))  # wide input
    assert not ok((1, 16, 16, 3), w3, s=(1, 1))  # stride 1
    assert not ok((1, 16, 16, 3), w3, d=(2, 2))  # dilation
    assert not ok((1, 16, 16, 3), w3, p=(0, 0))  # output != H/2


def test_phase_max_pool_matches_maxpool():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 10, 14, 5).astype(np.float32))
    ref = P.max_pool2d(x, 2, 2)
    got = S.s2d_max_pool_2x2(S.space_to_depth(x, 2, 2), 5)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("block", ["downsampler", "enet_initial"])
def test_stem_module_engages_and_matches(block):
    """The conv||pool concat stems route through the shared-relayout s2d
    path in TRAINING mode (the default gate is train-only — eval keeps the
    plain stride-2 lowering, measured faster forward; generic per-conv
    engagement was removed after it measured a 20% Fast-SCNN train
    regression). Outputs match the gated-off path at f32."""
    from esn_tpu import nn
    if block == "downsampler":
        from esn_tpu.models.blocks import DownsamplerConcat
        model = DownsamplerConcat(3, 16)
    else:
        from esn_tpu.models.enet import InitialBlock
        model = InitialBlock(3, 16)
    x = jnp.asarray(np.random.RandomState(3)
                    .randn(2, 16, 16, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    y_on, st_on = nn.apply(model, variables, x, train=True, mutable=True)
    os.environ["ESN_TPU_S2D_STEM"] = "0"
    try:
        y_off, st_off = nn.apply(model, variables, x, train=True,
                                 mutable=True)
    finally:
        os.environ.pop("ESN_TPU_S2D_STEM")
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                               rtol=1e-5, atol=1e-5)
    # the gate itself: train engages, eval does not, env overrides both ways
    from esn_tpu.nn.layers import _s2d_stem_enabled

    class FakeScope:
        is_init = False
        def __init__(self, train):
            self.train = train

    assert _s2d_stem_enabled(FakeScope(True))
    assert not _s2d_stem_enabled(FakeScope(False))
    os.environ["ESN_TPU_S2D_STEM"] = "1"
    try:
        assert _s2d_stem_enabled(FakeScope(False))
    finally:
        os.environ["ESN_TPU_S2D_STEM"] = "0"
    try:
        assert not _s2d_stem_enabled(FakeScope(True))
    finally:
        os.environ.pop("ESN_TPU_S2D_STEM")


def test_general_folded_conv_parity():
    """general_folded_conv == fold_w(conv2d(x)) across stride/fold shapes."""
    from esn_tpu.ops.folding import fold_w
    from esn_tpu.ops.s2d import general_folded_conv
    k = jax.random.PRNGKey(0)
    cases = [
        (3, 32, 3, 3, 2, 2, 1, 1, 2, 8, 4, 64, 96),   # CGNet conv1
        (3, 32, 3, 3, 2, 2, 1, 1, 2, 2, 1, 64, 96),   # classic s2d
        (32, 32, 3, 3, 1, 1, 1, 1, 1, 4, 4, 32, 48),  # stride-1 lane fold
        (3, 16, 7, 7, 2, 2, 3, 3, 2, 8, 4, 64, 96),   # big-kernel stem
        (12, 24, 5, 5, 4, 4, 2, 2, 4, 8, 2, 64, 96),  # stride-4
    ]
    for ci, co, kh, kw, sh, sw, ph, pw, fh, fwi, fo, hh, ww in cases:
        x = jax.random.normal(k, (2, hh, ww, ci), jnp.float32)
        w = jax.random.normal(k, (kh, kw, ci, co), jnp.float32)
        b = jax.random.normal(k, (co,), jnp.float32)
        want = fold_w(C.conv2d(x, w, stride=(sh, sw), padding=(ph, pw),
                               bias=b), fo)
        got = general_folded_conv(
            S.space_to_depth(x, fh, fwi), w, stride=(sh, sw),
            padding=(ph, pw), in_fold=(fh, fwi), out_fold_w=fo, bias=b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


def test_general_folded_conv_grad():
    """Weight/input grads flow through the traceable folded-kernel build."""
    from esn_tpu.ops.s2d import general_folded_conv
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (1, 16, 32, 3), jnp.float32)
    w = jax.random.normal(k, (3, 3, 3, 8), jnp.float32)

    def f_folded(w_):
        xs = S.space_to_depth(x, 2, 8)
        return jnp.sum(general_folded_conv(
            xs, w_, stride=(2, 2), padding=(1, 1), in_fold=(2, 8),
            out_fold_w=4) ** 2)

    def f_plain(w_):
        return jnp.sum(C.conv2d(x, w_, stride=(2, 2), padding=(1, 1)) ** 2)

    gf = jax.grad(f_folded)(w)
    gp = jax.grad(f_plain)(w)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gp),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,p,cin,cout,w", [
    (3, 1, 3, 16, 128), (3, 1, 3, 16, 64), (2, 0, 3, 13, 128),
])
def test_w_fold_stem_conv_matches_plain(k, p, cin, cout, w, rng):
    """r5 lane-full W-folded stem (pure-reshape fold/unfold): exact fwd,
    dW and dX parity with the plain strided conv."""
    x = jnp.asarray(rng.randn(2, 16, w, cin), jnp.float32)
    wt = jnp.asarray(rng.randn(k, k, cin, cout), jnp.float32)
    b = jnp.asarray(rng.randn(cout), jnp.float32)
    ref = C.conv2d(x, wt, stride=2, padding=p, bias=b)
    got = jax.jit(lambda x_, w_: S.w_fold_stem_conv(
        x_, w_, stride=(2, 2), padding=(p, p), bias=b))(x, wt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-5)
    gy = jnp.asarray(rng.randn(*ref.shape), jnp.float32)
    gr_w, gr_x = jax.grad(
        lambda w_, x_: jnp.vdot(C.conv2d(x_, w_, stride=2, padding=p), gy),
        argnums=(0, 1))(wt, x)
    gn_w, gn_x = jax.jit(jax.grad(
        lambda w_, x_: jnp.vdot(S.w_fold_stem_conv(
            x_, w_, stride=(2, 2), padding=(p, p)), gy),
        argnums=(0, 1)))(wt, x)
    np.testing.assert_allclose(np.asarray(gn_w), np.asarray(gr_w),
                               atol=3e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gn_x), np.asarray(gr_x),
                               atol=3e-3, rtol=1e-4)


def test_contextnet_folded_stem_model_parity(monkeypatch):
    """ContextNet opts into the folded stem by default (fold_stem attr);
    the whole-model forward + weight grads must match the plain lowering."""
    from esn_tpu import nn
    from esn_tpu.models import build_model
    from esn_tpu.train.losses import cross_entropy

    model = build_model("contextnet", 11)
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(2, 64, 128, 3), jnp.float32)
    y = jnp.asarray(r.randint(0, 11, (2, 64, 128)), jnp.int32)
    v = model.init(jax.random.PRNGKey(0), x)

    def loss(variables, flag):
        monkeypatch.setenv("ESN_TPU_S2D_CONV", flag)
        logits, _ = nn.apply(model, variables, x, train=True, mutable=True,
                             rngs={"dropout": jax.random.PRNGKey(1)})
        return cross_entropy(logits.astype(jnp.float32), y, num_classes=11)

    def run(flag):
        monkeypatch.setenv("ESN_TPU_S2D_CONV", flag)
        f = lambda params: loss({"params": params, "stats": v["stats"]}, flag)
        return jax.value_and_grad(f)(v["params"])

    l_off, g_off = run("0")
    l_on, g_on = run("auto")
    np.testing.assert_allclose(float(l_on), float(l_off), rtol=1e-5)
    # Whole-model backward reorders every downstream fusion, so the
    # cotangent reaching the stem carries f32 reduction-order noise that
    # cancellation in the dW sums amplifies (measured: 12/864 stem-kernel
    # elements off by up to 4e-2 abs while the unit-level test holds
    # 2e-4). A structural bug (wrong tap, wrong slot) would corrupt the
    # whole leaf, so compare per-leaf L2: tight against real errors,
    # immune to elementwise cancellation outliers. Tight parity lives in
    # test_w_fold_stem_conv_matches_plain and
    # test_convbnact_folded_stem_unit_parity.
    flat_off = jax.tree_util.tree_leaves(g_off)
    flat_on = jax.tree_util.tree_leaves(g_on)
    gscale = float(np.sqrt(sum(float(np.vdot(np.asarray(t, np.float64),
                                             np.asarray(t, np.float64)))
                               for t in flat_off)))
    for a, b_ in zip(flat_on, flat_off):
        a, b_ = np.asarray(a, np.float64), np.asarray(b_, np.float64)
        # floor the denominator at 1e-4 of the global grad norm:
        # numerically-zero leaves (measured |g| ~ 1e-7 on projection-BN
        # biases feeding residual adds) carry no signal and their
        # relative error is rounding residue
        err = np.linalg.norm(a - b_) / max(np.linalg.norm(b_),
                                           1e-4 * gscale)
        assert err < 2e-2, (a.shape, err)


def test_convbnact_folded_stem_unit_parity(monkeypatch):
    """The ConvBNAct stem unit (conv+BN+relu, train mode with batch
    stats) must match the plain path tightly at unit granularity."""
    from esn_tpu import nn
    from esn_tpu.models.blocks import ConvBNAct

    m = ConvBNAct(3, 32, 3, stride=2, act="relu")
    m.fold_stem = True
    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(2, 32, 128, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    gy = jnp.asarray(r.randn(2, 16, 64, 32), jnp.float32)

    def run(flag):
        monkeypatch.setenv("ESN_TPU_S2D_CONV", flag)

        def f(params):
            y, newv = nn.apply(m, {"params": params, "stats": v["stats"]},
                               x, train=True, mutable=True)
            return jnp.vdot(y, gy), newv["stats"]
        (l, stats), g = jax.value_and_grad(f, has_aux=True)(v["params"])
        return l, stats, g

    l0, s0, g0 = run("0")
    l1, s1, g1 = run("1")
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)
