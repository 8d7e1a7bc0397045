"""Feasibility: CGNet conv1 (3x3 s2, 3->32, full-res) as ONE dense conv on
an s2d(2,8)-folded input producing a W-folded(f=4) output.

  y[b,h,w,c] = conv_s2_p1(x)[...];   yf = fold_w(y, 4)
  xs = space_to_depth(x, 2, 8): xs[b,H,Q,(sh*8+sw)*3+c3] = x[b,2H+sh,8Q+sw,c3]
  yf[b,h,q,g*32+c] = y[b,h,4q+g,c]

Original tap (th,tw) of output (h, 4q+g):
  row 2h+th-1 -> (hI = h + (th-1)//2, slot_h = (th-1) % 2)
  col 8q+2g+tw-1 -> (qI = q + (2g+tw-1)//8, slot_w = (2g+tw-1) % 8)
Both offsets depend only on (th,tw,g) -> it IS a conv on xs with a
(2,2,48,128) kernel (taps hI-h in {-1,0}, qI-q in {-1,0}).

Run: python -m tools.bench_gs2d_conv1 [time|parity]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from esn_tpu.ops.s2d import space_to_depth


def build_kf(w):
    """w: (3,3,3,32) original conv1 kernel -> (2,2,48,128) folded kernel."""
    kf = np.zeros((2, 2, 48, 128), np.float32)
    wn = np.asarray(w, np.float32)
    for th in range(3):
        hoff, sh = divmod(th - 1, 2)      # hI - h in {-1, 0}, slot_h
        for tw in range(3):
            for g in range(4):
                qoff, sw = divmod(2 * g + tw - 1, 8)
                for c3 in range(3):
                    ci = (sh * 8 + sw) * 3 + c3
                    kf[hoff + 1, qoff + 1, ci, g * 32:(g + 1) * 32] += \
                        wn[th, tw, c3]
    return jnp.asarray(kf)


def run(xs, kf):
    # taps at offsets {-1,0} in both axes -> pad (1,0)
    return lax.conv_general_dilated(
        xs, kf.astype(xs.dtype), (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def slope(f, x, lo=4, hi=12):
    def mk(iters):
        @jax.jit
        def r(x):
            def body(i, c):
                acc, xx = c
                xx = xx * (1.0 + 1e-12 * i)
                return acc + jnp.sum(f(xx).astype(jnp.float32)), xx
            return lax.fori_loop(0, iters, body, (jnp.float32(0), x))[0]
        return r
    ts = {}
    for it in (lo, hi):
        r = mk(it)
        jax.device_get(r(x))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            jax.device_get(r(x))
            best = min(best, time.perf_counter() - t0)
        ts[it] = best
    return (ts[hi] - ts[lo]) / (hi - lo) * 1e3


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (3, 3, 3, 32), jnp.float32)
    kf = build_kf(w)
    if mode == "parity":
        x = jax.random.normal(key, (2, 64, 96, 3), jnp.float32)
        y = lax.conv_general_dilated(x, w, (2, 2), ((1, 1), (1, 1)),
                                     dimension_numbers=("NHWC", "HWIO",
                                                        "NHWC"))
        b, h, wo, c = y.shape
        yf_want = y.reshape(b, h, wo // 4, 4 * c)  # fold_w slot-major g*C+c?
        # fold_w convention: y[b,h,4q+g,c] -> [b,h,q,g*32+c]
        yf_want = y.reshape(b, h, wo // 4, 4, c).reshape(b, h, wo // 4,
                                                         4 * c)
        xs = space_to_depth(x, 2, 8)
        got = run(xs, kf)
        print("parity:", float(jnp.max(jnp.abs(got - yf_want))))
        return
    x = jax.random.normal(key, (16, 1024, 2048, 3), jnp.bfloat16)
    t_all = slope(lambda z: run(space_to_depth(z, 2, 8), kf), x)
    print(f"s2d+gs2dconv1: {t_all:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
