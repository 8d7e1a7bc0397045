import time
import jax, jax.numpy as jnp
from jax import lax

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

def native_dw_folded(x, w, f, d):
    # slot-uniform: folded conv == depthwise with dilation (d, d//f), kernel tiled f times
    c = w.shape[-1]
    wt = jnp.tile(w, (1, 1, f))[:, :, None, :].transpose(0, 1, 2, 3)  # (kh,kw,1,f*c)
    wt = jnp.tile(w, f).reshape(3, 3, 1, f * c)
    dh, dwf = d, d // f
    return lax.conv_general_dilated(
        x, wt.astype(x.dtype), (1, 1), [(dh, dh), (dwf, dwf)],
        rhs_dilation=(dh, dwf), feature_group_count=f * c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

k = jax.random.PRNGKey(0)
for (tag, B, H, Q, f, g, ds) in [("stage2", 64, 256, 128, 4, 32, (4, 8)),
                                 ("stage3", 64, 128, 128, 2, 64, (2, 4, 8))]:
    xf = jax.random.normal(k, (B, H, Q, f * g), jnp.bfloat16)
    w = jax.random.normal(k, (3, 3, g), jnp.float32) * 0.1
    for d in ds:
        t = slope(lambda a, dd=d: native_dw_folded(a, w, f, dd), (xf,))
        print(f"{tag} native-dw folded d={d}  {t:7.2f} ms", flush=True)
