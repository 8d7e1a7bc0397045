import sys, time, jax, jax.numpy as jnp
from jax import lax
from esn_tpu import nn
from esn_tpu.models.cgnet import CGBlockDown

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
        r = mk(it); jax.device_get(r(x))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter(); jax.device_get(r(x)); best = min(best, time.perf_counter()-t0)
        ts[it] = best
    return (ts[hi]-ts[lo])/(hi-lo)*1e3

which = sys.argv[1]
k = jax.random.PRNGKey(0)
if which == "down2":
    d = CGBlockDown(35, 64, dilation=2, reduction=8)
    x = jax.random.normal(k, (16,512,1024,35), jnp.bfloat16)
    v = d.init(k, jnp.zeros((1,64,64,35), jnp.float32))
else:
    d = CGBlockDown(131, 128, dilation=4, reduction=16)
    x = jax.random.normal(k, (16,256,512,131), jnp.bfloat16)
    v = d.init(k, jnp.zeros((1,64,64,131), jnp.float32))
print(f"{which} {slope(lambda z: nn.apply(d, v, z), x):8.2f} ms", flush=True)
