import sys, time
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from esn_tpu.ops import folding

def slope(f, args, lo=8, hi=24):
    def mk(iters):
        @jax.jit
        def run(*a):
            def body(i, carry):
                acc, aa = carry
                aa = tuple(x * (1.0 + 1e-12 * i) for x in aa)
                return acc + jnp.sum(f(*aa).astype(jnp.float32)), aa
            return lax.fori_loop(0, iters, body, (jnp.float32(0), a))[0]
        return run
    ts = {}
    for it in (lo, hi):
        r = mk(it)
        jax.device_get(r(*args))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            jax.device_get(r(*args))
            best = min(best, time.perf_counter() - t0)
        ts[it] = best
    return (ts[hi] - ts[lo]) / (hi - lo) * 1e3

B, H, Q, f, g = 64, 128, 128, 2, 64
k = jax.random.PRNGKey(0)
xf = jax.random.normal(k, (B, H, Q, f * g), jnp.bfloat16)
wdw = jax.random.normal(k, (3, 3, g), jnp.float32) * 0.1
wd4 = jax.random.normal(k, (3, 3, 1, g), jnp.float32) * 0.1
print(f"stage3 geom: (B,{H},{Q},{f*g}) f={f} g={g}", flush=True)
for d in (1, 2, 4, 8):
    t = slope(lambda a, dd=d: folding.folded_depthwise_conv(
        a, wdw, f, dilation=(dd, dd), padding=(dd, dd)), (xf,))
    u = "uniform" if d % f == 0 else "mixed"
    print(f"shift-FMA d={d} ({u:7s}) {t:7.2f} ms", flush=True)
for d in (1, 2, 4, 8):
    t = slope(lambda a, dd=d: folding.folded_conv2d(
        a, folding.depthwise_dense_kernel(wd4), f,
        dilation=(dd, dd), padding=(dd, dd)), (xf,))
    print(f"banded MXU d={d}         {t:7.2f} ms", flush=True)
