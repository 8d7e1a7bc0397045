import time
import jax, jax.numpy as jnp
from jax import lax
from esn_tpu.ops.convolution import conv2d, _conv_raw, _pair

def slope(f, x, lo=4, hi=16):
    def mk(iters):
        @jax.jit
        def run(x):
            def body(i, c):
                acc, xx = c
                xx = xx * (1.0 + 1e-12*i)
                return acc + f(xx), xx
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

k = jax.random.PRNGKey(0)
x = jax.random.normal(k, (8, 1024, 2048, 3), jnp.bfloat16)
w = jax.random.normal(k, (3, 3, 3, 32), jnp.float32) * 0.2

f_custom = lambda x: jnp.sum(jax.grad(lambda w_: jnp.sum(conv2d(x, w_, stride=2, padding=1).astype(jnp.float32)**2))(w))
f_native = lambda x: jnp.sum(jax.grad(lambda w_: jnp.sum(_conv_raw(x, w_, (2,2), ((1,1),(1,1)), (1,1), 1).astype(jnp.float32)**2))(w))
print("stem dW custom:", round(slope(f_custom, x), 3), "ms")
print("stem dW native:", round(slope(f_native, x), 3), "ms")
