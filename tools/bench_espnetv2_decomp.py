"""Decompose ESPNetv2 inference stage by stage (slope-timed).

ESPNetv2 [R: model/ESPNet_v2/] is the slowest zoo model (72 img/s b64 @
2048x1024 bf16; paper 1024x512 so its effective ratio still passes).
Candidate sinks: the grouped 1x1s (groups=4, small per-group matmuls),
the depthwise dilated branches (d=32..128 ch), the three raw-image
reinjection convs at 1/4..1/16 res, PSP, and the f32 head resize.

Run: python -m tools.bench_espnetv2_decomp [batch]
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


STAGES = ("stem", "down1", "level1", "down2", "level2", "down3", "level3",
          "psp", "head")


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    H, W = 1024, 2048
    model = build_model("espnetv2", 19)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3),
                                                    jnp.float32))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)

    class Partial(nn.Module):
        def __init__(self, upto):
            self.upto = upto

        def __call__(self, scope, x):
            u = self.upto
            h, w = x.shape[1:3]
            y = scope("stem", model.stem, x)
            if u == "stem":
                return y
            y = scope("down1", model.down1, y, x)
            if u == "down1":
                return y
            y = scope("level1", model.level1, y)
            if u == "level1":
                return y
            y = scope("down2", model.down2, y, x)
            if u == "down2":
                return y
            l2 = scope("level2", model.level2, y)
            if u == "level2":
                return l2
            y = scope("down3", model.down3, l2, x)
            if u == "down3":
                return y
            y = scope("level3", model.level3, y)
            if u == "level3":
                return y
            y = scope("psp", model.psp, y)
            if u == "psp":
                return y
            y = R.resize_bilinear(y, l2.shape[1:3])
            s = scope("proj_l2", model.proj_l2, l2)
            y = scope("fuse", model.fuse, jnp.concatenate([y, s], -1))
            y = scope("head", model.head, y)
            return R.resize_bilinear(y.astype(jnp.float32), (h, w)) \
                .astype(y.dtype)

    prev = 0.0
    for stage in STAGES:
        part = Partial(stage)
        t = slope(lambda x, p=part: jnp.sum(
            nn.apply(p, v, x).astype(jnp.float32)), x0)
        print(f"{stage:8s} cum {t:8.2f} ms   delta {t - prev:8.2f} ms")
        prev = t
    print(f"total: {prev:.2f} ms -> {B / prev * 1e3:.1f} img/s (b{B})")


if __name__ == "__main__":
    main()
