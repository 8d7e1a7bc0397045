import time, functools
import jax, jax.numpy as jnp
from jax import lax
from esn_tpu.ops import convolution as C

def slope(f, args, lo=6, hi=24):
    def mk(iters):
        @jax.jit
        def run(*a):
            def body(i, carry):
                acc, x = carry
                x = x * (1.0 + 1e-12 * i)
                y = f(x, *a[1:])
                return acc + (y if y.ndim == 0 else jnp.sum(y[0,0,0])).astype(jnp.float32), x
            acc, _ = lax.fori_loop(0, iters, body, (jnp.float32(0), a[0]))
            return acc
        return run
    ts = {}
    for it in (lo, hi):
        r = mk(it); jax.device_get(r(*args))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter(); jax.device_get(r(*args)); best = min(best, time.perf_counter()-t0)
        ts[it] = best
    return (ts[hi]-ts[lo])/(hi-lo)*1e3

k = jax.random.PRNGKey(0)
N,H,W,Ci,Co = 8, 256, 512, 64, 64
for dt in (jnp.bfloat16,):
    x = jax.random.normal(k, (N,H,W,Ci), dt)
    wd = jax.random.normal(k, (3,3,1,Ci), jnp.float32)*0.3
    wc = jax.random.normal(k, (3,3,Ci,Co), jnp.float32)*0.1
    wp = jax.random.normal(k, (1,1,Ci,Co), jnp.float32)*0.1

    fwd_dw = lambda x: C.depthwise_conv2d(x, wd, stride=1, padding=1)
    fwd_dense = lambda x: C.conv2d(x, wc, stride=1, padding=1)
    fwd_pw = lambda x: C.conv2d(x, wp)
    bwd = lambda f: (lambda x: jax.grad(lambda xx: jnp.sum(f(xx).astype(jnp.float32)**2))(x))
    gw_dw = lambda x: jax.grad(lambda w: jnp.sum(C.depthwise_conv2d(x, w, stride=1, padding=1).astype(jnp.float32)**2))(wd)
    gw_dense = lambda x: jax.grad(lambda w: jnp.sum(C.conv2d(x, w, stride=1, padding=1).astype(jnp.float32)**2))(wc)

    for name, f in [("dw fwd", fwd_dw), ("dw dx", bwd(fwd_dw)), ("dw dw(weights)", gw_dw),
                    ("dense fwd", fwd_dense), ("dense dx", bwd(fwd_dense)), ("dense dweights", gw_dense),
                    ("pw fwd", fwd_pw), ("pw dx", bwd(fwd_pw))]:
        try:
            print(f"{name:16s} {slope(f,(x,)):8.3f} ms")
        except Exception as e:
            print(name, "FAIL", str(e).splitlines()[0][:80])
