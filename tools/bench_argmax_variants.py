"""A/B argmax lowerings after real model producers (fastscnn/contextnet).

The producer-refusion tradeoff is model-dependent: for cheap producers
(bilinear upsample of 1/8-res logits) the naive variadic argmax fuses and
recomputes cheaply; for expensive producers (ESPNet's decoder) it is a
disaster. Quantifies naive vs packed-bf16 vs two-pass on both ends.

Run: python -m tools.bench_argmax_variants [model] [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

from esn_tpu import nn
from esn_tpu.models import build_model
from esn_tpu.ops.classify import _argmax_packed_bf16, _argmax_two_pass


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
    name = sys.argv[1] if len(sys.argv) > 1 else "fastscnn"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    H, W = 1024, 2048
    model = build_model(name, 19)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3),
                                                    jnp.float32))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)

    variants = {
        "naive": lambda y: jnp.argmax(y, -1),
        "packed": _argmax_packed_bf16,
        "twopass": _argmax_two_pass,
        "barrier+naive": lambda y: jnp.argmax(lax.optimization_barrier(y), -1),
        "nologits": lambda y: jnp.max(y, -1),  # floor: no argmax at all
    }
    for label, am in variants.items():
        def f(x, am=am):
            y = nn.apply(model, v, x)
            return jnp.sum(am(y).astype(jnp.float32))
        t = slope(f, x0)
        print(f"{name} b{B} {label:14s} {t:8.2f} ms {B / t * 1e3:7.1f} img/s")


if __name__ == "__main__":
    main()
