"""Prototype: subpixel lowering of ConvTranspose(k<=3, s=2) + argmax fusion.

ESPNet full fwd = 131 ms but fwd+argmax = 251 ms at (8,1024,2048) bf16: the
argmax variadic reduce refuses the zero-insert+conv decoder as its producer
and recomputes it per class. A subpixel lowering (stride-1 conv to s^2*O
channels at 1/2 res + depth-to-space) keeps all matmul work at low res and
gives argmax a cheap producer. Variants measured here gate the rewrite of
``ops/convolution.py::conv2d_transpose``.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from esn_tpu import nn
from esn_tpu.models import build_model
from esn_tpu.ops import convolution as C


def slope(f, init_x, lo=4, hi=12):
    def mk(iters):
        @jax.jit
        def run(x):
            def body(i, carry):
                acc, xx = carry
                xx = xx * (1.0 + 1e-12 * i)
                return acc + f(xx).astype(jnp.float32), xx
            return lax.fori_loop(0, iters, body, (jnp.float32(0), x))[0]
        return run
    ts = {}
    for it in (lo, hi):
        r = mk(it)
        jax.device_get(r(init_x))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            jax.device_get(r(init_x))
            best = min(best, time.perf_counter() - t0)
        ts[it] = best
    return (ts[hi] - ts[lo]) / (hi - lo) * 1e3


def subpixel_kernel(w, stride, padding):
    """Merge a HWIO convT kernel into a stride-1 conv kernel producing
    s*s*O channels (phase-major), plus per-axis (lo, hi) padding.

    Phase r output: out[s*q + r] = sum_u x[q - d0r - ... ] — derived
    numerically below and verified by the parity check in main().
    """
    K, Kw, I, O = w.shape
    s = stride
    p = padding
    # The framework's conv2d_transpose = zero-insert + UNFLIPPED stride-1
    # correlation with pad (K-1-p). Per phase r in [0,s):
    #   out[s*q + r] = sum_u x[q + delta] * w[u]
    #   where (u + r + p - K + 1) % s == 0, delta = (u + r + p - K + 1)//s.
    taps = []  # (rh, rw, dh, dw, kh, kw)
    drange = []
    for r in range(s):
        for u in range(K):
            if (u + r + p - K + 1) % s == 0:
                drange.append((u + r + p - K + 1) // s)
    dmin, dmax = min(drange), max(drange)
    U = dmax - dmin + 1
    sub = np.zeros((U, U, I, s * s * O), w.dtype)
    for rh in range(s):
        for rw in range(s):
            for kh in range(K):
                if (kh + rh + p - K + 1) % s != 0:
                    continue
                dh = (kh + rh + p - K + 1) // s
                for kw in range(K):
                    if (kw + rw + p - K + 1) % s != 0:
                        continue
                    dw = (kw + rw + p - K + 1) // s
                    oc = (rh * s + rw) * O
                    sub[dh - dmin, dw - dmin, :, oc:oc + O] = w[kh, kw]
    # y[q] = sum_t x[q + dmin + t] * ker[t] -> padding (-dmin, U-1+dmin)
    assert dmin <= 0, "unsupported geometry (would need input crop)"
    lo, hi = -dmin, U - 1 + dmin
    return jnp.asarray(sub), ((lo, hi), (lo, hi))


def convt_subpixel(x, w, stride=2, padding=0):
    s = stride
    ker, pad = subpixel_kernel(np.asarray(jax.device_get(w)), s, padding)
    O = w.shape[-1]
    y = lax.conv_general_dilated(
        x, jnp.asarray(ker, x.dtype), window_strides=(1, 1), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    n, h, wd, _ = y.shape
    y = y.reshape(n, h, wd, s, s, O).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, h * s, wd * s, O)


def main():
    # --- parity check vs existing lowering -------------------------------
    rng = np.random.RandomState(0)
    for (K, s, p, op) in [(2, 2, 0, 0), (3, 2, 1, 1)]:
        x = jnp.asarray(rng.randn(2, 16, 24, 7), jnp.float32)
        w = jnp.asarray(rng.randn(K, K, 7, 5), jnp.float32)
        ref = C.conv2d_transpose(x, w, stride=s, padding=p,
                                 output_padding=op)
        got = convt_subpixel(x, w, stride=s, padding=p)
        err = float(jnp.max(jnp.abs(ref - got)))
        print(f"k{K}s{s}p{p}op{op}: shape {got.shape} vs {ref.shape}, "
              f"maxerr {err:.2e}")
        assert ref.shape == got.shape and err < 1e-4, "parity FAIL"

    # --- ESPNet end-to-end variants --------------------------------------
    B, H, W = 8, 1024, 2048
    model = build_model("espnet", 19)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3),
                                                    jnp.float32))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)

    def fwd(x):
        return nn.apply(model, v, x)

    t = slope(lambda x: jnp.sum(jnp.argmax(fwd(x), -1)), x0)
    print(f"A plain argmax            {t:8.2f} ms {B/t*1e3:6.1f} img/s")

    t = slope(lambda x: jnp.sum(jnp.argmax(
        lax.optimization_barrier(fwd(x)), -1)), x0)
    print(f"B barrier + argmax        {t:8.2f} ms {B/t*1e3:6.1f} img/s")

    # C: replace final up1 with subpixel lowering
    up1w = v["params"]["up1"]["kernel"]  # (2,2,19,19)

    class Sub(nn.Module):
        def __call__(self, scope, x):
            f1, f2, f3 = model.enc.encode(scope.child("enc"), x)
            f1 = jnp.concatenate(f1, -1) if isinstance(f1, list) else f1
            f2 = jnp.concatenate(f2, -1) if isinstance(f2, list) else f2
            y = scope("proj3", model.proj3, f3)
            y = scope("up3", model.up3, y)
            s2 = scope("proj2", model.proj2, f2)
            y = scope("mix2", model.mix2, jnp.concatenate([y, s2], -1))
            y = scope("up2", model.up2, y)
            s1 = scope("proj1", model.proj1, f1)
            y = scope("mix1", model.mix1, jnp.concatenate([y, s1], -1))
            return y  # 1/2 res, C ch

    def half(x):
        return nn.apply(Sub(), v, x)

    def sub_logits(x):
        return convt_subpixel(half(x), up1w, stride=2, padding=0)

    t = slope(lambda x: jnp.sum(jnp.argmax(sub_logits(x), -1)), x0)
    print(f"C subpixel up1 + argmax   {t:8.2f} ms {B/t*1e3:6.1f} img/s")

    t = slope(lambda x: jnp.sum(jnp.argmax(
        lax.optimization_barrier(sub_logits(x)), -1)), x0)
    print(f"D subpixel + barrier      {t:8.2f} ms {B/t*1e3:6.1f} img/s")

    # E: argmax at 1/2 res per phase, depth-to-space the indices (ceiling)
    ker, pad = subpixel_kernel(np.asarray(jax.device_get(up1w)), 2, 0)

    def fused_pred(x):
        y = half(x)
        y = lax.conv_general_dilated(
            y, jnp.asarray(ker, y.dtype), window_strides=(1, 1), padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        n, h, w_, _ = y.shape
        y = y.reshape(n, h, w_, 4, 19)
        idx = jnp.argmax(y, -1).astype(jnp.int32)          # (n,h,w,4)
        idx = idx.reshape(n, h, w_, 2, 2).transpose(0, 1, 3, 2, 4)
        return idx.reshape(n, h * 2, w_ * 2)

    t = slope(lambda x: jnp.sum(fused_pred(x)), x0)
    print(f"E argmax@half + d2s idx   {t:8.2f} ms {B/t*1e3:6.1f} img/s")


if __name__ == "__main__":
    main()
