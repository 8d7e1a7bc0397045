"""Microbench: depthwise-conv lowerings at CGNet stage-2 shape.

bench_cgnet_decomp shows stage2 (3 CG blocks, 64 ch @ 1/4 res) costs
28 ms/block at b16 2048x1024 — ~7x the HBM-roundtrip bound. Hypothesis:
XLA's TPU lowering of feature_group_count=C depthwise convs at 32 ch is
the sink. Alternatives, all mathematically exact:

  a) xla_dw      — plain depthwise (feature_group_count = C)
  b) dense_diag  — dense conv, kernel diagonal in (I, O): runs on the MXU;
                   wastes CxC FLOPs per tap but MXU FLOPs at 32 ch are ~free
  c) fused_pair  — CG block's loc(3x3 d1) || sur(3x3 d=d) as ONE dense
                   conv C -> 2C with a (2d+1)-tap kernel: one input pass,
                   the concat materializes as the conv output

Run: python -m tools.bench_dw_lowering [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def slope(f, init_x, lo=8, hi=24):
    def mk(iters):
        @jax.jit
        def run(x):
            def body(i, carry):
                acc, xx = carry
                xx = xx * (1.0 + 1e-12 * i)
                return acc + jnp.sum(f(xx).astype(jnp.float32)), xx
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


def conv(x, w, d, groups):
    pad = d * (w.shape[0] - 1) // 2
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(pad, pad)] * 2,
        rhs_dilation=(d, d), feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    which = sys.argv[2] if len(sys.argv) > 2 else "abc"
    H, W, C = 256, 512, 32      # CGNet stage2: y = reduce(x), 32 ch
    D = 2                       # sur dilation at stage2
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
    dw_loc = jax.random.normal(key, (3, 3, C), jnp.float32)
    dw_sur = jax.random.normal(key, (3, 3, C), jnp.float32)

    # a) plain XLA depthwise pair + concat
    wl = dw_loc[:, :, None, :]     # (3,3,1,C) feature_group_count=C
    ws = dw_sur[:, :, None, :]
    if "a" in which:
        t = slope(lambda v: jnp.concatenate(
            [conv(v, wl, 1, C), conv(v, ws, D, C)], -1), x)
        print(f"xla_dw pair      {t:7.3f} ms", flush=True)

    # b) dense diagonal pair + concat
    eye = np.eye(C, dtype=np.float32)
    dl = jnp.asarray(np.einsum("hwc,co->hwco", np.asarray(dw_loc), eye))
    ds = jnp.asarray(np.einsum("hwc,co->hwco", np.asarray(dw_sur), eye))
    if "b" in which:
        t = slope(lambda v: jnp.concatenate(
            [conv(v, dl, 1, 1), conv(v, ds, D, 1)], -1), x)
        print(f"dense_diag pair  {t:7.3f} ms", flush=True)

    # c) one fused dense conv C -> 2C, (2D+1)^2 taps
    K = 2 * D + 1
    wf = np.zeros((K, K, C, 2 * C), np.float32)
    o = D - 1  # loc 3x3 occupies the center of the KxK window
    wf[o:o + 3, o:o + 3, :, :C] = np.einsum(
        "hwc,co->hwco", np.asarray(dw_loc), eye)
    for th in range(3):          # sur taps at dilation-D positions
        for tw in range(3):
            wf[th * D, tw * D, :, C:] += np.einsum(
                "c,co->co", np.asarray(dw_sur[th, tw]), eye)
    wfj = jnp.asarray(wf)
    if "c" in which:
        t = slope(lambda v: conv(v, wfj, 1, 1), x)
        print(f"fused_pair 5x5   {t:7.3f} ms", flush=True)

    if "p" in which:  # parity check (f32; run with JAX_PLATFORMS=cpu)
        xf = jax.random.normal(key, (2, 64, 96, C), jnp.float32)
        ref = jnp.concatenate([conv(xf, wl, 1, C), conv(xf, ws, D, C)], -1)
        got_b = jnp.concatenate([conv(xf, dl, 1, 1), conv(xf, ds, D, 1)],
                                -1)
        got_c = conv(xf, wfj, 1, 1)
        print("parity dense_diag:", float(jnp.max(jnp.abs(ref - got_b))))
        print("parity fused_pair:", float(jnp.max(jnp.abs(ref - got_c))))


if __name__ == "__main__":
    main()
