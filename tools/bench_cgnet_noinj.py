"""Measurement-only CGNet variant: no raw-input injections, so every
inter-stage tensor is lane-aligned (32/64/128/256 ch). If this is much
faster than the real model, the misaligned 35/131-ch concat chains are the
hidden cost and the conv-split rewrite (conv(concat) == sum of convs on the
pieces) is worth building.

Run: python -m tools.bench_cgnet_noinj [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

from esn_tpu import nn
from esn_tpu.models.blocks import BNAct, ConvBNAct
from esn_tpu.models.cgnet import BN_EPS, CGBlock, CGBlockDown
from esn_tpu.ops import resize as R


class CGNetNoInj(nn.Module):
    def __init__(self, classes=19, m=3, n=21):
        self.stem = nn.Sequential(
            ConvBNAct(3, 32, 3, stride=2, act="prelu", bn_eps=BN_EPS),
            ConvBNAct(32, 32, 3, act="prelu", bn_eps=BN_EPS),
            ConvBNAct(32, 32, 3, act="prelu", bn_eps=BN_EPS))
        self.b1 = BNAct(32, act="prelu", bn_eps=BN_EPS)
        self.down2 = CGBlockDown(32, 64, dilation=2, reduction=8)
        self.stage2 = nn.ScanChain(CGBlock(64, 2, 8), m - 1)
        self.b2 = BNAct(128, act="prelu", bn_eps=BN_EPS)
        self.down3 = CGBlockDown(128, 128, dilation=4, reduction=16)
        self.stage3 = nn.ScanChain(CGBlock(128, 4, 16), n - 1)
        self.b3 = BNAct(256, act="prelu", bn_eps=BN_EPS)
        self.head = nn.Conv(256, classes, 1, bias=False)

    def __call__(self, scope, x):
        h, w = x.shape[1:3]
        y = scope("b1", self.b1, scope("stem", self.stem, x))
        d2 = scope("down2", self.down2, y)
        s2 = scope("stage2", self.stage2, d2)
        y = scope("b2", self.b2, jnp.concatenate([s2, d2], -1))
        d3 = scope("down3", self.down3, y)
        s3 = scope("stage3", self.stage3, d3)
        y = scope("b3", self.b3, jnp.concatenate([s3, d3], -1))
        y = scope("head", self.head, y)
        return R.resize_bilinear(y.astype(jnp.float32), (h, w)) \
            .astype(y.dtype)


def slope(f, x, lo=4, hi=12):
    def mk(iters):
        @jax.jit
        def run(x):
            def body(i, c):
                acc, xx = c
                xx = xx * (1.0 + 1e-12 * i)
                return acc + jnp.sum(f(xx).astype(jnp.float32)), xx
            return lax.fori_loop(0, iters, body, (jnp.float32(0), x))[0]
        return run
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
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    m = CGNetNoInj()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3),
                                                jnp.float32))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 1024, 2048, 3),
                          jnp.bfloat16)
    t = slope(lambda z: nn.apply(m, v, z), x)
    print(f"noinj b{B}: {t:8.2f} ms  {B / t * 1e3:6.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
