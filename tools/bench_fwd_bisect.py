import time
import jax, jax.numpy as jnp
from jax import lax
from esn_tpu import nn
from esn_tpu.models import build_model
from esn_tpu.train.losses import cross_entropy

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
        r = mk(it); jax.device_get(r(init_x))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter(); jax.device_get(r(init_x)); best = min(best, time.perf_counter()-t0)
        ts[it] = best
    return (ts[hi]-ts[lo])/(hi-lo)*1e3

model = build_model("fastscnn", 19)
v = model.init(jax.random.PRNGKey(0), jnp.zeros((1,128,128,3), jnp.float32))
B,H,W = 8, 1024, 2048
x0 = jax.random.normal(jax.random.PRNGKey(1), (B,H,W,3), jnp.bfloat16)
y = jax.random.randint(jax.random.PRNGKey(2), (B,H,W), 0, 19)
key = jax.random.PRNGKey(3)

t = slope(lambda x: jnp.sum(jnp.argmax(nn.apply(model, v, x), -1)), x0)
print(f"eval fwd           {t:8.2f} ms ({B/t*1e3:6.1f} img/s)")

t = slope(lambda x: jnp.sum(jnp.argmax(
    nn.apply(model, v, x, train=True, mutable=False,
             rngs={"dropout": key})[0] if False else
    nn.apply(model, v, x, train=True, rngs={"dropout": key}), -1)), x0)
print(f"train fwd, no stats out, no loss {t:8.2f} ms ({B/t*1e3:6.1f} img/s)")

def f2(x):
    logits, nv = nn.apply(model, v, x, train=True, mutable=True, rngs={"dropout": key})
    return jnp.sum(jnp.argmax(logits, -1)) + jnp.sum(
        jax.tree_util.tree_leaves(nv["stats"])[0]).astype(jnp.float32)
t = slope(f2, x0)
print(f"train fwd + stats out, no loss   {t:8.2f} ms ({B/t*1e3:6.1f} img/s)")

t = slope(lambda x: cross_entropy(
    nn.apply(model, v, x).astype(jnp.float32), y, num_classes=19), x0)
print(f"eval fwd + CE loss  {t:8.2f} ms ({B/t*1e3:6.1f} img/s)")
