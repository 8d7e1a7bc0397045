"""Decompose ESPNet inference time: encoder vs each decoder stage.

ESPNet runs 29.7 img/s at (8,1024,2048) bf16 while the encoder-only
ESPNet-C runs 140 — the light decoder costs ~4.7x. Hypothesis: the
19/38-channel ops at 1/2 and full res are HBM-bound with 128-lane padding
waste. Slope-timed (see tools/README.md).
"""
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
    B, H, W = 8, 1024, 2048
    model = build_model("espnet", 19)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3),
                                                    jnp.float32))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)

    m = model  # bound module

    class Partial(nn.Module):
        def __init__(self, upto):
            self.upto = upto

        def __call__(self, scope, xx):
            upto = self.upto
            f1, f2, f3 = m.enc.encode(scope.child("enc"), xx)
            # encode now returns f1/f2 as virtual-concat pieces; this
            # decomposition harness measures the materialized-decoder
            # baseline, so concat them here
            f1 = jnp.concatenate(f1, -1) if isinstance(f1, list) else f1
            f2 = jnp.concatenate(f2, -1) if isinstance(f2, list) else f2
            if upto == "enc":
                return f3
            y = scope("proj3", m.proj3, f3)
            y = scope("up3", m.up3, y)
            if upto == "up3":
                return y
            s2 = scope("proj2", m.proj2, f2)
            y = scope("mix2", m.mix2, jnp.concatenate([y, s2], -1))
            if upto == "mix2":
                return y
            y = scope("up2", m.up2, y)
            if upto == "up2":
                return y
            s1 = scope("proj1", m.proj1, f1)
            y = scope("mix1", m.mix1, jnp.concatenate([y, s1], -1))
            if upto == "mix1":
                return y
            return scope("up1", m.up1, y)

    def run_stages(x, upto):
        return nn.apply(Partial(upto), v, x)

    stages = ["enc", "up3", "mix2", "up2", "mix1", "full"]
    prev = 0.0
    for s in stages:
        t = slope(lambda x, s=s: jnp.sum(run_stages(x, s)
                                         .astype(jnp.float32)), x0)
        print(f"upto {s:5s}  {t:8.2f} ms  (+{t - prev:7.2f})"
              f"  {B / t * 1e3:6.1f} img/s")
        prev = t

    t = slope(lambda x: jnp.sum(jnp.argmax(nn.apply(m, v, x), -1)), x0)
    print(f"full + argmax {t:8.2f} ms  {B / t * 1e3:6.1f} img/s")


if __name__ == "__main__":
    main()
