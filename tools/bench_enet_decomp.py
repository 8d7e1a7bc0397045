"""Decompose ENet inference time per stage (b32, 2048x1024 bf16).

Run: python -m tools.bench_enet_decomp [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

from esn_tpu import nn
from esn_tpu.models import build_model


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


STAGES = ["initial", "down1", "stage1", "down2", "stage2", "stage3",
          "up4", "stage4", "up5", "stage5", "fullconv"]


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    H, W = 1024, 2048
    m = build_model("enet", 19)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3),
                                                jnp.float32))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)

    class Partial(nn.Module):
        def __init__(self, upto):
            self.upto = upto

        def __call__(self, scope, x):
            y = scope("initial", m.initial, x)
            if self.upto == "initial":
                return y
            y, idx1 = scope("down1", m.down1, y)
            if self.upto == "down1":
                return y
            for name, stage in [("stage1", m.stage1)]:
                y = scope(name, stage, y)
                if self.upto == name:
                    return y
            y, idx2 = scope("down2", m.down2, y)
            if self.upto == "down2":
                return y
            for name, stage in [("stage2", m.stage2), ("stage3", m.stage3)]:
                y = scope(name, stage, y)
                if self.upto == name:
                    return y
            y = scope("up4", m.up4, y, idx2)
            if self.upto == "up4":
                return y
            y = scope("stage4", m.stage4, y)
            if self.upto == "stage4":
                return y
            y = scope("up5", m.up5, y, idx1)
            if self.upto == "up5":
                return y
            y = scope("stage5", m.stage5, y)
            if self.upto == "stage5":
                return y
            return scope("fullconv", m.fullconv, y)

    prev = 0.0
    for s in STAGES:
        pm = Partial(s)
        t = slope(lambda x, pm=pm: jnp.sum(nn.apply(pm, v, x)
                                           .astype(jnp.float32)), x0)
        print(f"upto {s:8s} {t:8.2f} ms  (+{t - prev:7.2f})"
              f"  {B / t * 1e3:6.1f} img/s")
        prev = t

    from esn_tpu.ops import argmax_lastdim
    t = slope(lambda x: jnp.sum(argmax_lastdim(nn.apply(m, v, x))), x0)
    print(f"full+argmax   {t:8.2f} ms  {B / t * 1e3:6.1f} img/s")


if __name__ == "__main__":
    main()
