"""CGNet stem variants at b16 2048x1024 bf16 (stem = 28.7 ms of 134.5).

Variants (all exact rewrites of conv3x3s2(3->32) + 2x conv3x3(32->32),
each BN+PReLU):
  plain   — as the model runs today
  s2d     — conv1 via space-to-depth (dense stride-1 on 12 lanes)
  fold    — conv2/conv3 W->C folded f=4 (128 dense lanes, banded kernels)
  both    — s2d conv1 + folded conv2/3 (fold_w after conv1 is a free
            reshape; one unfold at the end)

Run: python -m tools.bench_cgnet_stem VARIANT [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

from esn_tpu import nn
from esn_tpu.models.blocks import ConvBNAct
from esn_tpu.models.cgnet import BN_EPS
from esn_tpu.ops import folding as F
from esn_tpu.ops import s2d as S


class Stem(nn.Module):
    def __init__(self, variant: str):
        self.variant = variant
        self.c1 = ConvBNAct(3, 32, 3, stride=2, act="prelu", bn_eps=BN_EPS)
        self.c2 = ConvBNAct(32, 32, 3, act="prelu", bn_eps=BN_EPS)
        self.c3 = ConvBNAct(32, 32, 3, act="prelu", bn_eps=BN_EPS)

    def _conv1(self, scope, x):
        if self.variant in ("s2d", "both") and not scope.is_init:
            s = scope.child("c1")
            w, b = self.c1.conv.params(s.child("conv"))
            y = S.s2d_conv2d(x, w, stride=(2, 2), padding=(1, 1), bias=b)
            y = self.c1.bn(s.child("bn"), y)
            return self.c1.act(s.child("act"), y)
        return scope("c1", self.c1, x)

    def __call__(self, scope, x):
        y = self._conv1(scope, x)
        if self.variant in ("fold", "both") and not scope.is_init:
            f = 4
            yf = F.fold_w(y, f)
            for name, m in (("c2", self.c2), ("c3", self.c3)):
                s = scope.child(name)
                w, b = m.conv.params(s.child("conv"))
                yf = F.folded_conv2d(yf, w, f, padding=(1, 1), bias=b)
                yf = m.bn.folded_apply(s.child("bn"), yf, f)
                yf = m.act.folded_apply(s.child("act"), yf, f)
            return F.unfold_w(yf, f)
        y = scope("c2", self.c2, y)
        return scope("c3", self.c3, y)


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
    variant = sys.argv[1]
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    m = Stem(variant)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 1024, 2048, 3),
                          jnp.bfloat16)
    if variant == "parity":
        xs = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 96, 3),
                               jnp.float32)
        outs = {}
        for vr in ("plain", "s2d", "fold", "both"):
            m.variant = vr
            outs[vr] = nn.apply(m, v, xs)
        import numpy as np
        for vr in ("s2d", "fold", "both"):
            print(vr, float(jnp.max(jnp.abs(outs[vr] - outs["plain"]))))
        return
    t = slope(lambda z: nn.apply(m, v, z), x)
    print(f"stem[{variant}] b{B}: {t:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()


class StemCut(Stem):
    def __init__(self, variant, upto):
        super().__init__(variant)
        self.upto = upto

    def __call__(self, scope, x):
        y = self._conv1(scope, x)
        if self.upto >= 2:
            y = scope("c2", self.c2, y)
        if self.upto >= 3:
            y = scope("c3", self.c3, y)
        return y
