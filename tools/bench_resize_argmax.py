"""Benchmark the fused bilinear-upsample+argmax prediction tail.

The resize-tail models (9 of 18) end in: logits at 1/r res -> f32
bilinear xr -> cast -> argmax. XLA's best lowering fuses the upsample
into the variadic argmax reduce (full-res logits never hit HBM) but
recomputes the interpolation per class with the class axis in lanes —
measured 53.7 ms of Fast-SCNN's 151 ms b128 predict step. The Pallas
kernel (ops/pallas/resize_argmax.py) computes each subpixel phase once,
W-in-lanes, and writes only int32 indices.

Measured (v5e, (128,128,256,19) bf16 logits, r=8, standalone tail):
    unfused XLA tail (argmax-of-resize)   66.2 ms
    Pallas kernel + d2s interleave        19.0 ms
      of which: kernel 7.5 / copies 8.4 / concat 1.1 (profiler)
End-to-end flagship: Fast-SCNN b128 2048x1024 bf16 predict
    916 -> 1446 img/s (+58%).

Run: python -m tools.bench_resize_argmax
"""
import time

import jax
import jax.numpy as jnp

from esn_tpu.ops.pallas.resize_argmax import resize_argmax, resize_argmax_ref


def timeit(f, x, iters=10):
    f(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(x)
    r.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1000


def main():
    y = jax.random.normal(jax.random.PRNGKey(1), (128, 128, 256, 19),
                          jnp.bfloat16)
    f = jax.jit(lambda v: resize_argmax(v, 8))
    g = jax.jit(lambda v: resize_argmax_ref(v, 8))
    match = float(jnp.mean((f(y) == g(y)).astype(jnp.float32)))
    print(f"match rate vs unfused tail: {match:.6f}")
    print(f"pallas fused : {timeit(f, y):8.2f} ms")
    print(f"xla unfused  : {timeit(g, y):8.2f} ms")


if __name__ == "__main__":
    main()
