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

# folded packed variants: W folded into lanes so key math runs dense
def packed(x):
    b = lax.bitcast_convert_type(x + jnp.asarray(0, x.dtype), jnp.uint16).astype(jnp.int32)
    key = jnp.where(b >= 0x8000, b ^ 0xFFFF, b | 0x8000)
    idx = lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    m = jnp.max((key << 8) | (255 - idx), axis=-1)
    return 255 - (m & 255)

def packed_folded(x, f=6):
    B,H,W,C = x.shape
    xf = x.reshape(B, H, W//f, f*C)
    b = lax.bitcast_convert_type(xf + jnp.asarray(0, x.dtype), jnp.uint16).astype(jnp.int32)
    key = jnp.where(b >= 0x8000, b ^ 0xFFFF, b | 0x8000)
    idx = lax.broadcasted_iota(jnp.int32, xf.shape, 3) % C
    keys = (key << 8) | (255 - idx)
    m = jnp.max(keys.reshape(B, H, W//f, f, C), axis=-1)
    return (255 - (m & 255)).reshape(B, H, W)

if __name__ == "__main__" or True:
    for n, f in {"packed": packed, "packed_folded6": packed_folded,
                 "packed_folded_f2": lambda x: packed_folded(x, 2),
                 "naive2": lambda x: jnp.argmax(x, -1)}.items():
        print(f"{n:16s} {slope(f, x):8.3f} ms")
