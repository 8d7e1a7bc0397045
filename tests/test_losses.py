"""Loss zoo tests — torch CE as independent oracle, hand-math for the rest."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esn_tpu.train import losses


def _rand_problem(rng, n=2, h=6, w=7, c=5, ignore=255, ignore_frac=0.2):
    logits = rng.randn(n, h, w, c).astype(np.float32)
    labels = rng.randint(0, c, size=(n, h, w)).astype(np.int64)
    mask = rng.rand(n, h, w) < ignore_frac
    labels[mask] = ignore
    weights = rng.rand(c).astype(np.float32) + 0.5
    return logits, labels, weights


def test_weighted_ce_matches_torch(rng):
    torch = pytest.importorskip("torch")
    logits, labels, weights = _rand_problem(rng)
    ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(labels),
        weight=torch.from_numpy(weights), ignore_index=255).item()
    got = losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                               num_classes=5,
                               class_weights=jnp.asarray(weights),
                               ignore_index=255)
    assert float(got) == pytest.approx(ref, rel=1e-5)


def test_label_smoothing_matches_torch(rng):
    torch = pytest.importorskip("torch")
    logits, labels, _ = _rand_problem(rng, ignore_frac=0.0)
    ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(labels), label_smoothing=0.1).item()
    got = losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                               num_classes=5, ignore_index=255,
                               label_smoothing=0.1)
    assert float(got) == pytest.approx(ref, rel=1e-5)


def test_ohem_reduces_to_hard_pixels(rng):
    # construct: half the pixels trivially correct (huge margin), half hard
    c = 4
    logits = np.zeros((1, 4, 4, c), np.float32)
    labels = np.zeros((1, 4, 4), np.int64)
    logits[0, :2, :, 0] = 50.0        # easy: prob ~1 for true class 0
    logits[0, 2:, :, 1] = 5.0         # hard: true class 0, predicted 1
    loss = losses.ohem_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), num_classes=c,
        ignore_index=255, thresh=0.7, min_kept=1)
    # only the 8 hard pixels should be kept -> loss ~= CE of hard pixels
    hard_ce = -np.log(np.exp(0.0) / (np.exp(5.0) + (c - 1)))
    assert float(loss) == pytest.approx(hard_ce, rel=1e-3)


def test_ohem_min_kept_floor(rng):
    # all pixels easy -> min_kept forces the k hardest to be kept, loss finite
    logits, labels, w = _rand_problem(rng, ignore_frac=0.0)
    logits = logits + 100.0 * np.eye(5, dtype=np.float32)[labels]
    loss = losses.ohem_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), num_classes=5,
        class_weights=jnp.asarray(w), min_kept=7)
    assert np.isfinite(float(loss))
    assert float(loss) < 1e-3  # easy pixels -> tiny loss


def test_kth_smallest_exact_vs_partition(rng):
    """Radix select is bit-exact vs np.partition on random + tie-heavy
    inputs (zeros, duplicated values, the OHEM invalid sentinel 2.0)."""
    for trial in range(8):
        n = int(rng.randint(5, 4000))
        x = rng.rand(n).astype(np.float32)
        if trial % 2:  # adversarial ties: quantize to few distinct values
            x = np.round(x * 8) / 8
        x[rng.rand(n) < 0.1] = 2.0
        x[rng.rand(n) < 0.05] = 0.0
        for k in {1, 2, n // 2, n - 1, n}:
            if k < 1:
                continue
            got = float(losses.kth_smallest(jnp.asarray(x), k))
            ref = float(np.partition(x, k - 1)[k - 1])
            assert got == ref, (trial, k, got, ref)


def test_ohem_kept_mask_parity_radix_vs_topk(rng, monkeypatch):
    """The shipped radix threshold and the reference-shaped top_k threshold
    produce IDENTICAL losses (same kept masks) on random and tie-heavy
    problems — VERDICT r2 item 1's parity gate."""
    for tie in (False, True):
        logits, labels, weights = _rand_problem(rng, n=2, h=16, w=16, c=5)
        if tie:  # quantized logits -> massively tied p_true
            logits = np.round(logits)
        kwargs = dict(num_classes=5, class_weights=jnp.asarray(weights),
                      ignore_index=255, thresh=0.7, min_kept=37)
        monkeypatch.setenv("ESN_TPU_OHEM_TOPK", "1")
        ref = losses.ohem_cross_entropy(jnp.asarray(logits),
                                        jnp.asarray(labels), **kwargs)
        monkeypatch.setenv("ESN_TPU_OHEM_TOPK", "0")
        got = losses.ohem_cross_entropy(jnp.asarray(logits),
                                        jnp.asarray(labels), **kwargs)
        assert float(got) == float(ref)


def test_focal_gamma0_equals_ce(rng):
    logits, labels, weights = _rand_problem(rng)
    ce = losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                              num_classes=5, class_weights=jnp.asarray(weights))
    fl = losses.focal_loss(jnp.asarray(logits), jnp.asarray(labels),
                           num_classes=5, class_weights=jnp.asarray(weights),
                           gamma=0.0)
    assert float(fl) == pytest.approx(float(ce), rel=1e-5)


def test_lovasz_perfect_prediction_near_zero(rng):
    labels = rng.randint(0, 4, size=(1, 8, 8)).astype(np.int64)
    logits = 80.0 * np.eye(4, dtype=np.float32)[labels]
    loss = losses.lovasz_softmax(jnp.asarray(logits), jnp.asarray(labels),
                                 num_classes=4)
    assert float(loss) < 1e-4


def test_lovasz_matches_naive_numpy(rng):
    """Oracle: direct numpy transcription of the Lovász-Softmax definition."""
    c = 3
    logits, labels, _ = _rand_problem(rng, n=1, h=5, w=5, c=c, ignore_frac=0.2)

    def naive(logits, labels, ignore=255):
        p = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        p = p.reshape(-1, c)
        y = labels.reshape(-1)
        keep = y != ignore
        p, y = p[keep], y[keep]
        total, count = 0.0, 0
        for cls in range(c):
            fg = (y == cls).astype(np.float64)
            if fg.sum() == 0:
                continue
            err = np.abs(fg - p[:, cls])
            order = np.argsort(-err, kind="stable")
            es, fs = err[order], fg[order]
            gts = fs.sum()
            inter = gts - np.cumsum(fs)
            union = gts + np.cumsum(1 - fs)
            jac = 1.0 - inter / union
            jac[1:] = jac[1:] - jac[:-1]
            total += float(np.dot(es, jac))
            count += 1
        return total / max(count, 1)

    ref = naive(logits, labels)
    got = losses.lovasz_softmax(jnp.asarray(logits), jnp.asarray(labels),
                                num_classes=c)
    assert float(got) == pytest.approx(ref, rel=1e-4, abs=1e-5)


def test_lovasz_hist_matches_sort(rng):
    """Counting-sweep Lovász must match the sort-based formulation: the
    value within the 4096-bucket quantization error, and the gradient
    element-wise (outside tie blocks both reduce to the same exact
    ΔJaccard coefficient per pixel)."""
    c = 6
    logits, labels, _ = _rand_problem(rng, n=2, h=9, w=11, c=c,
                                      ignore_frac=0.15)
    lg, lb = jnp.asarray(logits), jnp.asarray(labels)

    ref_v, ref_g = jax.value_and_grad(
        lambda x: losses.lovasz_softmax(x, lb, num_classes=c))(lg)
    got_v, got_g = jax.value_and_grad(
        lambda x: losses.lovasz_softmax_hist(x, lb, num_classes=c,
                                             chunk=256))(lg)
    assert float(got_v) == pytest.approx(float(ref_v), abs=2e-3)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                               atol=2e-3)


def test_lovasz_hist_perfect_prediction_near_zero(rng):
    labels = rng.randint(0, 4, size=(1, 8, 8)).astype(np.int64)
    logits = 80.0 * np.eye(4, dtype=np.float32)[labels]
    loss = losses.lovasz_softmax_hist(jnp.asarray(logits),
                                      jnp.asarray(labels), num_classes=4,
                                      chunk=64)
    assert float(loss) < 1e-3


def test_all_losses_jit_and_grad(rng):
    logits, labels, weights = _rand_problem(rng)
    for name in losses.LOSS_REGISTRY:
        fn = losses.build_loss(name, num_classes=5, ignore_index=255)

        @jax.jit
        def f(lg):
            return fn(lg, jnp.asarray(labels),
                      class_weights=jnp.asarray(weights))

        g = jax.grad(f)(jnp.asarray(logits))
        assert np.all(np.isfinite(np.asarray(g))), name


@pytest.mark.parametrize("s,hw", [(4, (6, 8)), (8, (5, 7))])
def test_resize_ce_matches_materialized(rng, s, hw):
    """Chunked resize-CE == CE over a materialized bilinear upsample,
    value and gradient, with class weights + ignore pixels."""
    from esn_tpu.ops.resize import resize_bilinear
    h, w = hw
    c = 5
    z = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
    labels = rng.randint(0, c, size=(2, h * s, w * s)).astype(np.int64)
    labels[rng.rand(*labels.shape) < 0.2] = 255
    labels = jnp.asarray(labels)
    weights = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)

    def ref(zz):
        full = resize_bilinear(zz.astype(jnp.float32),
                               (h * s, w * s))
        return losses.cross_entropy(full, labels, num_classes=c,
                                    class_weights=weights,
                                    ignore_index=255)

    def got(zz):
        return losses.resize_cross_entropy(zz, labels, num_classes=c,
                                           class_weights=weights,
                                           ignore_index=255)

    rv, rg = jax.value_and_grad(ref)(z)
    gv, gg = jax.value_and_grad(got)(z)
    assert float(gv) == pytest.approx(float(rv), rel=1e-5)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(rg),
                               rtol=1e-4, atol=1e-6)


def test_resize_ce_label_smoothing_and_fallback(rng):
    from esn_tpu.ops.resize import resize_bilinear
    c = 4
    z = jnp.asarray(rng.randn(1, 6, 6, c).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, c, size=(1, 24, 24)))
    ref = losses.cross_entropy(
        resize_bilinear(z, (24, 24)), labels, num_classes=c,
        ignore_index=255, label_smoothing=0.1)
    got = losses.resize_cross_entropy(z, labels, num_classes=c,
                                      ignore_index=255,
                                      label_smoothing=0.1)
    assert float(got) == pytest.approx(float(ref), rel=1e-5)
    # anisotropic scale falls back to the materialized path
    lab2 = jnp.asarray(rng.randint(0, c, size=(1, 24, 12)))
    ref2 = losses.cross_entropy(
        resize_bilinear(z, (24, 12)), lab2, num_classes=c,
        ignore_index=255)
    got2 = losses.resize_cross_entropy(z, lab2, num_classes=c,
                                       ignore_index=255)
    assert float(got2) == pytest.approx(float(ref2), rel=1e-6)
