"""Decompose ERFNet inference: encoder vs decoder stages.

Hypothesis: the nb1d(16) blocks at 1/2 res dominate — 16 channels on
128-wide lanes is 8x HBM padding waste at large spatial. Evidence for a
folded-lane (W into C) stage transform. Slope-timed.

Run: python -m tools.bench_erfnet_decomp [batch]
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


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    H, W = 1024, 2048
    model = build_model("erfnet", 19)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3),
                                                    jnp.float32))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)

    class Partial(nn.Module):
        def __init__(self, upto):
            self.upto = upto

        def __call__(self, scope, xx):
            y = scope("encoder", model.encoder, xx)
            if self.upto == "enc":
                return y
            dec = scope.child("decoder")
            for i, layer in enumerate(model.decoder.layers):
                y = dec(str(i), layer, y)
                if self.upto == f"dec{i}":
                    return y
            return scope("head", model.head, y)

    stages = ["enc"] + [f"dec{i}" for i in range(6)] + ["full"]
    prev = 0.0
    for s in stages:
        pm = Partial(s)
        t = slope(lambda x, pm=pm: jnp.sum(nn.apply(pm, v, x)
                                           .astype(jnp.float32)), x0)
        print(f"upto {s:5s}  {t:8.2f} ms  (+{t - prev:7.2f})"
              f"  {B / t * 1e3:6.1f} img/s")
        prev = t

    from esn_tpu.ops import argmax_lastdim
    t = slope(lambda x: jnp.sum(argmax_lastdim(nn.apply(model, v, x))), x0)
    print(f"full + argmax {t:8.2f} ms  {B / t * 1e3:6.1f} img/s")


if __name__ == "__main__":
    main()
