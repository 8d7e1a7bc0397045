"""Confusion-matrix mIoU, LR schedules, optimizer factory tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esn_tpu.train import metrics, optimizers, schedules


def test_confusion_matrix_matches_numpy(rng):
    k = 6
    gt = rng.randint(0, k, size=(2, 9, 9))
    pred = rng.randint(0, k, size=(2, 9, 9))
    gt[0, :2] = 255  # ignored
    cm = np.asarray(metrics.confusion_matrix(jnp.asarray(pred),
                                             jnp.asarray(gt), k))
    ref = np.zeros((k, k), np.int64)
    for g, p in zip(gt.reshape(-1), pred.reshape(-1)):
        if g != 255:
            ref[g, p] += 1
    np.testing.assert_array_equal(cm, ref)


def test_iou_perfect_and_known():
    k = 3
    gt = jnp.array([[0, 0, 1, 1, 2, 2]])
    cm = metrics.confusion_matrix(gt, gt, k)
    iou, miou = metrics.iou_from_confusion(cm)
    np.testing.assert_allclose(np.asarray(iou), 1.0)
    assert float(miou) == pytest.approx(1.0)

    pred = jnp.array([[0, 1, 1, 1, 2, 0]])
    cm = metrics.confusion_matrix(pred, gt, k)
    iou, miou = metrics.iou_from_confusion(cm)
    # class0: tp=1 fn=1 fp=1 -> 1/3 ; class1: tp=2 fp=1 -> 2/3 ; class2: 1/2
    np.testing.assert_allclose(np.asarray(iou), [1 / 3, 2 / 3, 1 / 2],
                               rtol=1e-6)
    assert float(miou) == pytest.approx((1 / 3 + 2 / 3 + 1 / 2) / 3)


def test_miou_absent_class_excluded():
    k = 4  # class 3 never appears in gt or pred
    gt = jnp.array([[0, 1, 2, 0]])
    cm = metrics.confusion_matrix(gt, gt, k)
    _, miou = metrics.iou_from_confusion(cm)
    assert float(miou) == pytest.approx(1.0)  # absent class not averaged in


def test_streaming_evaluator(rng):
    k = 5
    ev = metrics.MeanIoU(k)
    gts, preds = [], []
    for _ in range(3):
        g = rng.randint(0, k, size=(1, 8, 8))
        p = rng.randint(0, k, size=(1, 8, 8))
        ev.update(jnp.asarray(p), jnp.asarray(g))
        gts.append(g)
        preds.append(p)
    all_cm = np.asarray(metrics.confusion_matrix(
        jnp.asarray(np.stack(preds)), jnp.asarray(np.stack(gts)), k))
    np.testing.assert_array_equal(ev.matrix, all_cm)


def test_poly_schedule():
    s = schedules.poly_schedule(0.01, 1000, 0.9)
    assert float(s(0)) == pytest.approx(0.01)
    assert float(s(1000)) == pytest.approx(0.0)
    assert float(s(500)) == pytest.approx(0.01 * 0.5 ** 0.9, rel=1e-5)


def test_warmup_poly_schedule():
    s = schedules.warmup_poly_schedule(0.3, 2000, warmup_steps=100,
                                       warmup_factor=1 / 3)
    assert float(s(0)) == pytest.approx(0.1, rel=1e-5)       # factor * base
    assert float(s(100)) == pytest.approx(0.3 * (1 - 100 / 2000) ** 0.9,
                                          rel=1e-4)
    mid = float(s(50))
    assert 0.1 < mid < 0.3


@pytest.mark.parametrize("name", ["sgd", "adam", "adamw", "radam", "ranger"])
def test_optimizers_step(name):
    opt = optimizers.build_optimizer(name, 0.1)
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, state = opt.update(grads, state, params)
        import optax
        return optax.apply_updates(params, updates), state

    p1, state = step(params, state)
    for _ in range(10):
        p1, state = step(p1, state)
    assert float(p1["w"][0, 0]) < 1.0  # moved against the gradient
    assert np.all(np.isfinite(np.asarray(p1["w"])))


def test_ranger_lookahead_sync():
    # with sync_period=2 and slow_step=0.5 the param path differs from radam
    import optax
    inner = optax.sgd(0.1)
    la = optimizers.lookahead(inner, sync_period=2, slow_step_size=0.5)
    params = jnp.array(10.0)
    state = la.init(params)
    traj = []
    for _ in range(4):
        updates, state = la.update(jnp.array(1.0), state, params)
        params = params + updates
        traj.append(float(params))
    # step1 fast: 9.9 ; step2 sync: fast=9.8, slow=10+0.5*(9.8-10)=9.9 -> 9.9
    # step3 fast: 9.8 ; step4 sync: fast=9.7, slow=9.9+0.5*(9.7-9.9)=9.8 -> 9.8
    assert traj == [pytest.approx(v) for v in (9.9, 9.9, 9.8, 9.8)]
