"""Micro-benchmark: Pallas fused_dsconv vs unfused XLA at zoo hot shapes.

Run on the real TPU: ``python -m tools.bench_dsconv``.

Timing method: the op runs inside a jitted ``lax.fori_loop`` (input perturbed
per step so nothing hoists), at two iteration counts; the reported time is
the SLOPE between them. This environment reaches the TPU through a relay
with a large fixed per-call dispatch cost (~25-40 ms) that would otherwise
swamp any per-op measurement.
"""
import time

import jax
import jax.numpy as jnp
from jax import lax

from esn_tpu.ops.pallas import dsconv as K

LO, HI = 8, 40


def make_looped(impl, stride, iters):
    @jax.jit
    def run(x, dw, a1, b1, pw, a2, b2):
        def body(i, carry):
            acc, xx = carry
            xx = xx * (1.0 + 1e-12 * i)  # defeat CSE/hoisting
            y = K.fused_dsconv(xx, dw, a1, b1, pw, a2, b2, stride=stride,
                               impl=impl)
            return acc + jnp.sum(y[0, 0, 0]).astype(jnp.float32), xx
        acc, _ = lax.fori_loop(0, iters, body, (jnp.float32(0.0), x))
        return acc
    return run


def slope_ms(impl, stride, args, repeats=3):
    ts = {}
    for iters in (LO, HI):
        fn = make_looped(impl, stride, iters)
        jax.device_get(fn(*args))  # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            jax.device_get(fn(*args))
            best = min(best, time.perf_counter() - t0)
        ts[iters] = best
    return (ts[HI] - ts[LO]) / (HI - LO) * 1e3


def main():
    rng = jax.random.PRNGKey(0)
    shapes = [
        (8, 512, 1024, 32, 48, 2),    # Fast-SCNN LDS dsconv1 @2048x1024 b8
        (8, 256, 512, 48, 64, 2),     # LDS dsconv2
        (8, 128, 256, 128, 128, 1),   # FFM/classifier res
        (8, 256, 512, 64, 64, 1),     # ContextNet spatial branch
        (1, 1024, 2048, 32, 48, 2),   # batch-1 latency case
    ]
    for dt in (jnp.bfloat16, jnp.float32):
        for (n, h, w, ci, co, s) in shapes:
            ks = jax.random.split(rng, 7)
            x = jax.random.normal(ks[0], (n, h, w, ci), dt)
            dw = jax.random.normal(ks[1], (3, 3, ci), jnp.float32) * 0.3
            pw = jax.random.normal(ks[2], (ci, co), jnp.float32) * 0.2
            a1 = jax.random.uniform(ks[3], (ci,)) + 0.5
            b1 = jax.random.normal(ks[4], (ci,)) * 0.1
            a2 = jax.random.uniform(ks[5], (co,)) + 0.5
            b2 = jax.random.normal(ks[6], (co,)) * 0.1
            args = (x, dw, a1, b1, pw, a2, b2)

            try:
                tp = slope_ms("pallas", s, args)
            except Exception as e:  # noqa: BLE001
                tp = float("nan")
                print("  pallas FAILED:", type(e).__name__,
                      str(e).splitlines()[0][:110])
            tx = slope_ms("xla", s, args)
            isz = x.dtype.itemsize
            gb = (x.size * isz + n * (h // s) * (w // s) * co * isz) / 1e9
            print(f"{str(x.dtype):9s} N{n} {h}x{w} {ci}->{co} s{s}: "
                  f"pallas {tp:7.3f} ms  xla {tx:7.3f} ms  "
                  f"speedup {tx / tp:5.2f}x  min-BW {gb / (tp / 1e3):5.0f} GB/s")


if __name__ == "__main__":
    main()
