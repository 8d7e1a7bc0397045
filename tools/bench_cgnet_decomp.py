"""Decompose CGNet inference stage by stage (slope-timed).

CGNet [R: model/CGNet.py] is the one zoo model clearly below the 3x/chip
bar (83.9 img/s b16 vs paper ~50 fps V100 @ 2048x1024). Candidate sinks:
the 1/2-res 32-ch stem (25% lane density at 1024x512), the 21 CG blocks'
dual depthwise convs at 64 ch (50% lanes, VPU-bound), the f32 bilinear
head resize (160 MB/img write), and per-block FGlo gating round trips.

Run: python -m tools.bench_cgnet_decomp [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

from esn_tpu import nn
from esn_tpu.models import build_model
from esn_tpu.ops import resize as R


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


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    H, W = 1024, 2048
    model = build_model("cgnet", 19)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3),
                                                    jnp.float32))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)

    class Partial(nn.Module):
        def __init__(self, upto):
            self.upto = upto

        def __call__(self, scope, x):
            u = self.upto
            s1 = scope("stem", model.stem, x)
            if u == "stem":
                return s1
            i1 = scope("inj1", model.inj1, x)
            i2 = scope("inj2", model.inj2, x)
            y = scope("b1", model.b1, jnp.concatenate([s1, i1], -1))
            if u == "b1":
                return y
            d2 = scope("down2", model.down2, y)
            if u == "down2":
                return d2
            s2 = scope("stage2", model.stage2, d2)
            y = scope("b2", model.b2, jnp.concatenate([s2, d2, i2], -1))
            if u == "stage2":
                return y
            d3 = scope("down3", model.down3, y)
            if u == "down3":
                return d3
            s3 = scope("stage3", model.stage3, d3)
            if u == "stage3":
                return s3
            y = scope("b3", model.b3, jnp.concatenate([s3, d3], -1))
            y = scope("drop", model.drop, y)
            y = scope("head", model.head, y)
            if u == "head":
                return y
            return R.resize_bilinear(y.astype(jnp.float32), (H, W)) \
                .astype(y.dtype)

    prev = 0.0
    for s in ["stem", "b1", "down2", "stage2", "down3", "stage3", "head",
              "full"]:
        pm = Partial(s)
        t = slope(lambda x, pm=pm: jnp.sum(nn.apply(pm, v, x)
                                           .astype(jnp.float32)), x0)
        print(f"upto {s:7s}  {t:8.2f} ms  (+{t - prev:7.2f})"
              f"  {B / t * 1e3:6.1f} img/s", flush=True)
        prev = t

    t = slope(lambda x: jnp.sum(
        nn.apply(model, v, x, method="predict").astype(jnp.float32)), x0)
    print(f"predict      {t:8.2f} ms  {B / t * 1e3:6.1f} img/s")


if __name__ == "__main__":
    main()
