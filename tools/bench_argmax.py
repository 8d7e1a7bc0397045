import time
import jax, jax.numpy as jnp
from jax import lax
from esn_tpu.ops import argmax_lastdim

def slope(f, x, lo=4, hi=16):
    def mk(iters):
        @jax.jit
        def run(x):
            def body(i, c):
                acc, xx = c
                xx = xx * (1.0 + 1e-12*i)
                return acc + jnp.sum(f(xx)).astype(jnp.float32), xx
            return lax.fori_loop(0, iters, body, (jnp.float32(0), x))[0]
        return run
    ts = {}
    for it in (lo, hi):
        r = mk(it); jax.device_get(r(x))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter(); jax.device_get(r(x)); best = min(best, time.perf_counter()-t0)
        ts[it] = best
    return (ts[hi]-ts[lo])/(hi-lo)*1e3

x = jax.random.normal(jax.random.PRNGKey(0), (8, 1024, 2048, 19), jnp.bfloat16)

def packed_argmax(x):
    # single variadic-free pass: pack (value, index) into one f32 ordering key.
    # bf16 has 8 mantissa bits; scale value into exponent-space and add index
    xf = x.astype(jnp.float32)
    k = x.shape[-1]
    idx = lax.broadcasted_iota(jnp.float32, x.shape, x.ndim - 1)
    key = xf * k - idx  # first max wins ties ONLY if gaps > 1/k... not exact
    m = jnp.max(key, axis=-1)
    return (jnp.ceil((m) )).astype(jnp.int32)  # placeholder, timing only

variants = {
    "jnp.max": lambda x: jnp.max(x, -1),
    "jnp.argmax": lambda x: jnp.argmax(x, -1),
    "argmax_lastdim": argmax_lastdim,
    "sum_lastdim": lambda x: jnp.sum(x, -1),
    "max_f32": lambda x: jnp.max(x.astype(jnp.float32), -1),
    "onehot_dot": lambda x: jnp.einsum(
        "nhwc,c->nhw", (x == jnp.max(x, -1, keepdims=True)).astype(jnp.bfloat16),
        jnp.arange(19, dtype=jnp.bfloat16)),
}
for n, f in variants.items():
    print(f"{n:16s} {slope(f, x):8.3f} ms")
