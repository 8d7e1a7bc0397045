"""Decompose FPENet inference stage by stage (slope-timed).

FPENet [R: model/FPENet.py] is the weakest zoo model vs its paper ratio
(84.4 img/s b64 @ 2048x1024 bf16; paper ~55 fps @ 1024x512 -> ~3.1x).
Candidate sinks: stage1 (t=1 FPE block at 1/2 res, depthwise groups of
g=4 channels = 3% lane density), the 8-deep stage3 scan, the MEU decoder
(full 1/2-res gating), and the f32 head resize.

Run: python -m tools.bench_fpenet_decomp [batch]
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


STAGES = ("stem", "stage1", "down2", "stage2", "down3", "stage3",
          "meu2", "meu1", "head")


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    H, W = 1024, 2048
    model = build_model("fpenet", 19)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3),
                                                    jnp.float32))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)

    class Partial(nn.Module):
        def __init__(self, upto):
            self.upto = upto

        def __call__(self, scope, x):
            u = self.upto
            h, w = x.shape[1:3]
            from esn_tpu.ops import folding
            folded = (model.down2.fold > 1 and model.stage3.block.fold > 1)
            s1 = scope("stage1", model.stage1, scope("stem", model.stem, x))
            if u == "stem" or u == "stage1":
                return s1
            y = scope("down2", model.down2,
                      folding.fold_w(s1, 8) if folded else s1)
            if u == "down2":
                return y
            s2 = scope("stage2", model.stage2, y)
            if u == "stage2":
                return s2
            y = scope("down3", model.down3, s2)
            if u == "down3":
                return y
            s3 = scope("stage3", model.stage3, y)
            if u == "stage3":
                return s3
            if folded:
                s2 = folding.unfold_w(s2, 4)
                s3 = folding.unfold_w(s3, 2)
            y = scope("meu2", model.meu2, s3, s2)
            if u == "meu2":
                return y
            y = scope("meu1", model.meu1, y, s1)
            if u == "meu1":
                return y
            y = scope("head", model.head, y)
            return R.resize_bilinear(y.astype(jnp.float32), (h, w)) \
                .astype(y.dtype)

    class StemOnly(nn.Module):
        def __call__(self, scope, x):
            return scope("stem", model.stem, x)

    prev = 0.0
    for stage in STAGES:
        if stage == "stem":
            part = StemOnly()
        else:
            part = Partial(stage)
        t = slope(lambda x, p=part: jnp.sum(
            nn.apply(p, v, x).astype(jnp.float32)), x0)
        print(f"{stage:8s} cum {t:8.2f} ms   delta {t - prev:8.2f} ms")
        prev = t
    print(f"total: {prev:.2f} ms -> {B / prev * 1e3:.1f} img/s (b{B})")


if __name__ == "__main__":
    main()
