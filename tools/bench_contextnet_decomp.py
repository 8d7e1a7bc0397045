"""ContextNet stage decomposition (VERDICT r3 item 2: the #2 zoo model
measured at 43.6% of HBM roof / 7.8% of MXU — at no roof; where does the
time go?).

Slope-times the full predict step, then each stage in isolation with
pre-materialized inputs: the 1/4 input resize, the full-res shallow
branch, the low-res deep branch (MobileNetV2 stack), the fusion + ds +
head tail, and the fused upsample-argmax tail. Sum-of-parts vs whole
exposes dispatch overhead / missing fusion.

Run: python -m tools.bench_contextnet_decomp [--batch 128]
"""
import argparse
import time

import jax
import jax.numpy as jnp
from jax import lax

from esn_tpu import nn
from esn_tpu.models import build_model
from esn_tpu.ops import resize as R


def slope(f, *init, lo=4, hi=12):
    def mk(iters):
        @jax.jit
        def run(*xs):
            def body(i, carry):
                acc, xs_ = carry
                xs_ = tuple(x * (1.0 + 1e-12 * i) for x in xs_)
                return acc + f(*xs_).astype(jnp.float32), xs_
            return lax.fori_loop(0, iters, body, (jnp.float32(0), xs))[0]
        return run
    ts = {}
    for it in (lo, hi):
        r = mk(it)
        jax.device_get(r(*init))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            jax.device_get(r(*init))
            best = min(best, time.perf_counter() - t0)
        ts[it] = best
    return (ts[hi] - ts[lo]) / (hi - lo) * 1e3


def sub(v, name):
    return {"params": v["params"][name], "stats": v["stats"].get(name, {})}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", default="1024,2048")
    args = ap.parse_args()
    H, W = (int(s) for s in args.size.split(","))
    B = args.batch

    model = build_model("contextnet", 19)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 128, 128, 3), jnp.float32))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)

    rows = []

    def rec(name, ms):
        rows.append((name, ms))
        print(f"{name:28s} {ms:8.2f} ms  ({B / ms * 1e3:7.1f} img/s)",
              flush=True)

    rec("full predict",
        slope(lambda xx: jnp.sum(
            nn.apply(model, v, xx, method="predict"), dtype=jnp.int32), x))
    rec("logits_lowres (no tail)",
        slope(lambda xx: jnp.sum(
            nn.apply(model, v, xx, method="logits_lowres")
            .astype(jnp.float32)), x))
    rec("input resize 1/4",
        slope(lambda xx: jnp.sum(
            R.resize_bilinear(xx, (H // 4, W // 4)).astype(jnp.float32)), x))
    rec("shallow branch (full res)",
        slope(lambda xx: jnp.sum(
            nn.apply(model.shallow, sub(v, "shallow"), xx)
            .astype(jnp.float32)), x))
    x4 = R.resize_bilinear(x, (H // 4, W // 4))
    rec("deep branch (1/4 res)",
        slope(lambda xx: jnp.sum(
            nn.apply(model.deep, sub(v, "deep"), xx)
            .astype(jnp.float32)), x4))
    high = jnp.zeros((B, H // 8, W // 8, 128), jnp.bfloat16)
    low = jnp.zeros((B, H // 32, W // 32, 128), jnp.bfloat16)

    def tail(hh, ll):
        y = nn.apply(model.fusion, sub(v, "fusion"), hh, ll)
        y = nn.apply(model.ds1, sub(v, "ds1"), y)
        y = nn.apply(model.ds2, sub(v, "ds2"), y)
        return jnp.sum(nn.apply(model.head, sub(v, "head"), y)
                       .astype(jnp.float32))
    rec("fusion+ds+head (1/8 res)", slope(tail, high, low))

    parts = sum(ms for name, ms in rows[2:])
    print(f"\nsum of parts {parts:8.2f} ms vs logits_lowres "
          f"{rows[1][1]:8.2f} ms (gap = inter-stage fusion / dispatch)")
    print(f"fused tail cost = full - lowres = "
          f"{rows[0][1] - rows[1][1]:8.2f} ms")


if __name__ == "__main__":
    main()
