"""Benchmark the OHEM k-th-hardest-pixel selection: radix select vs top_k.

VERDICT r2 weak #2: OHEM (BASELINE config 5's loss) cost 29% of full-res
training throughput, all in an exact `lax.top_k` over B*H*W = 16.7M pixel
probabilities. `losses.kth_smallest` replaces it with an exact monotone
radix search over the IEEE-754 bit pattern (8 fused count sweeps).

Measured (v5e, N = 8*1024*2048, k = N/16, f32):
    lax.top_k                      39.8 ms
    radix, lane-padded (N,16)       3.03 ms
    radix, 16 scalar-broadcast      2.45 ms   <- shipped
Values bit-identical across all variants (and vs np.partition).

Run: python tools/bench_ohem_kth.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from esn_tpu.train.losses import kth_smallest


def timeit(f, x, iters=20):
    f(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(x)
    r.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1000


def main():
    n = 8 * 1024 * 2048
    k = n // 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(n).astype(np.float32))

    f_radix = jax.jit(lambda v: kth_smallest(v, k))
    f_topk = jax.jit(lambda v: -jax.lax.top_k(-v, k)[0][-1])

    a, b = float(f_radix(x)), float(f_topk(x))
    assert a == b, (a, b)
    print(f"N={n} k={k}  (values bit-identical: {a})")
    print(f"radix select : {timeit(f_radix, x):8.3f} ms")
    print(f"lax.top_k    : {timeit(f_topk, x):8.3f} ms")


if __name__ == "__main__":
    main()
