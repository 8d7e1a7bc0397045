"""Fused bilinear-upsample + CE Pallas kernel (ops/pallas/resize_ce.py):
value + gradient parity against cross_entropy(resize_bilinear(z)) in
interpret mode, plus the multi-block row-window regression (the first
version's BlockSpec strided overlapping windows by block SIZE — correct
at h == rb, garbage rows at h > rb; caught by the r=2, h=16 case)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from esn_tpu.ops.pallas.resize_ce import resize_ce_sums, _expand_matrix
from esn_tpu.ops.resize import resize_bilinear
from esn_tpu.train.losses import cross_entropy


CASES = [
    # (B, h, w, C, r, eps, weighted)
    (2, 8, 16, 19, 8, 0.0, True),    # production-like incl. class weights
    (1, 4, 8, 5, 8, 0.1, False),     # label smoothing
    (1, 8, 8, 11, 4, 0.0, True),     # r=4
    (2, 16, 32, 19, 2, 0.1, True),   # multi-block rows (h > rb)
    (1, 24, 16, 19, 8, 0.0, True),   # 3 row blocks
]


@pytest.mark.parametrize("B,h,w,C,r,eps,weighted", CASES)
def test_resize_ce_value_and_grad_parity(B, h, w, C, r, eps, weighted):
    rng = np.random.RandomState(B * h + C)
    z = jnp.asarray(rng.randn(B, h, w, C), jnp.float32)
    lab = rng.randint(0, C + 1, (B, h * r, w * r)).astype(np.int32)
    lab[lab == C] = 255                      # sprinkle ignore pixels
    lab = jnp.asarray(lab)
    cw = jnp.asarray(rng.rand(C) + 0.5, jnp.float32) if weighted else None

    def ref_loss(zz):
        full = resize_bilinear(zz.astype(jnp.float32), (h * r, w * r))
        return cross_entropy(full, lab, num_classes=C, class_weights=cw,
                             ignore_index=255, label_smoothing=eps)

    def new_loss(zz):
        S, N = resize_ce_sums(zz, lab, cw, r=r, ignore_index=255,
                              label_smoothing=eps, interpret=True)
        return S / jnp.maximum(N, 1e-8)

    l0, g0 = jax.value_and_grad(ref_loss)(z)
    l1, g1 = jax.value_and_grad(new_loss)(z)
    assert abs(float(l0 - l1)) < 1e-4, (float(l0), float(l1))
    rel = float(jnp.linalg.norm(g0 - g1) / jnp.linalg.norm(g0))
    assert rel < 1e-4, rel


def test_resize_ce_matches_f64_oracle():
    """Absolute ground truth at a tiny size: f64 numpy upsample + CE."""
    r, B, h, w, C = 2, 1, 2, 4, 3
    rng = np.random.RandomState(1)
    z = rng.randn(B, h, w, C).astype(np.float32)
    lab = rng.randint(0, C, (B, h * r, w * r)).astype(np.int32)

    def f64_loss(zz):
        Eh = _expand_matrix(h, r).astype(np.float64)
        Ew = _expand_matrix(w, r).astype(np.float64)
        up = np.einsum("hH,bhwc->bHwc", Eh, zz.astype(np.float64))
        up = np.einsum("wW,bHwc->bHWc", Ew, up)
        m = up.max(-1, keepdims=True)
        lse = m[..., 0] + np.log(np.exp(up - m).sum(-1))
        true = np.take_along_axis(up, lab[..., None].astype(np.int64),
                                  -1)[..., 0]
        return (lse - true).mean()

    g64 = np.zeros(z.shape, np.float64)
    eps = 1e-6
    for i in np.ndindex(*z.shape):
        zp = z.astype(np.float64).copy()
        zm = z.astype(np.float64).copy()
        zp[i] += eps
        zm[i] -= eps
        g64[i] = (f64_loss(zp) - f64_loss(zm)) / (2 * eps)

    def new_loss(zz):
        S, N = resize_ce_sums(zz, jnp.asarray(lab), None, r=r,
                              ignore_index=255, interpret=True)
        return S / jnp.maximum(N, 1e-8)

    l1, g1 = jax.value_and_grad(new_loss)(jnp.asarray(z))
    assert abs(float(l1) - f64_loss(z)) < 1e-5
    rel = np.linalg.norm(np.asarray(g1) - g64) / np.linalg.norm(g64)
    assert rel < 1e-6, rel


def test_resize_ce_all_ignored_is_finite():
    """All-ignored labels: N == 0, S == 0 — the caller's max(N, eps)
    keeps the loss finite and the gradient must be exactly zero."""
    r, B, h, w, C = 8, 1, 8, 8, 19
    z = jnp.asarray(np.random.RandomState(0).randn(B, h, w, C), jnp.float32)
    lab = jnp.full((B, h * r, w * r), 255, jnp.int32)

    def new_loss(zz):
        S, N = resize_ce_sums(zz, lab, None, r=r, ignore_index=255,
                              interpret=True)
        return S / jnp.maximum(N, 1e-8)

    l, g = jax.value_and_grad(new_loss)(z)
    assert np.isfinite(float(l)) and float(l) == 0.0
    assert float(jnp.abs(g).max()) == 0.0
