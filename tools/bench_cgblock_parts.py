"""Decompose ONE CGNet stage-2 block (64 ch, 1/4 res) part by part.

bench_cgnet_decomp: 28 ms/block at b16 2048x1024; bench_dw_lowering: the
depthwise pair alone is ~6.7 ms. Find the other 21 ms.

Run: python -m tools.bench_cgblock_parts [batch] [part]
parts: reduce | dw | join | glo | res | block
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

from esn_tpu import nn
from esn_tpu.models.cgnet import CGBlock


def slope(f, init_x, lo=4, hi=12):
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
    # fall-through uses the LAST measured; recompute properly
        ts[it] = best
    return (ts[hi] - ts[lo]) / (hi - lo) * 1e3


class Partial(nn.Module):
    def __init__(self, blk, upto):
        self.blk = blk
        self.upto = upto

    def __call__(self, scope, x):
        b = self.blk
        u = self.upto
        y = scope("reduce", b.reduce, x)
        if u == "reduce":
            return y
        loc = scope("loc", b.loc, y)
        sur = scope("sur", b.sur, y)
        y = jnp.concatenate([loc, sur], -1)
        if u == "dw":
            return y
        y = scope("join", b.join, y)
        if u == "join":
            return y
        y = scope("glo", b.glo, y)
        if u == "glo":
            return y
        return x + y


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    part = sys.argv[2] if len(sys.argv) > 2 else "res"
    H, W, C = 256, 512, 64
    blk = CGBlock(C, dilation=2)
    v = blk.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, C),
                                                  jnp.float32))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, C), jnp.bfloat16)
    pm = Partial(blk, part)
    t = slope(lambda z: nn.apply(pm, v, z), x)
    print(f"upto {part:7s}  {t:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
