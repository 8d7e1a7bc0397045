import time
import jax, jax.numpy as jnp
from jax import lax
from esn_tpu import nn
from esn_tpu.models import build_model
from esn_tpu.train.losses import cross_entropy

def slope(mk, lo=4, hi=12):
    ts = {}
    for it in (lo, hi):
        r = mk(it); jax.device_get(r())
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter(); jax.device_get(r()); best = min(best, time.perf_counter()-t0)
        ts[it] = best
    return (ts[hi]-ts[lo])/(hi-lo)*1e3

model = build_model("fastscnn", 19)
v = model.init(jax.random.PRNGKey(0), jnp.zeros((1,128,128,3), jnp.float32))
B, H, W = 8, 1024, 2048
x = jax.random.normal(jax.random.PRNGKey(1), (B,H,W,3), jnp.bfloat16)
y = jax.random.randint(jax.random.PRNGKey(2), (B,H,W), 0, 19)
key = jax.random.PRNGKey(3)

def fwd_eval(v, x):
    return jnp.sum(jnp.argmax(nn.apply(model, v, x), -1))

def fwd_train(v, x):
    logits, nv = nn.apply(model, v, x, train=True, mutable=True, rngs={"dropout": key})
    return cross_entropy(logits.astype(jnp.float32), y, num_classes=19)

def fwd_bwd(v, x):
    def loss(params):
        logits, nv = nn.apply(model, {"params": params, "stats": v["stats"]}, x,
                              train=True, mutable=True, rngs={"dropout": key})
        return cross_entropy(logits.astype(jnp.float32), y, num_classes=19)
    l, g = jax.value_and_grad(loss)(v["params"])
    return l + sum(jnp.sum(t).astype(jnp.float32) for t in jax.tree_util.tree_leaves(g)[:1])

for name, f in [("fwd eval", fwd_eval), ("fwd train(BN+loss)", fwd_train), ("fwd+bwd", fwd_bwd)]:
    def mk(iters, f=f):
        @jax.jit
        def run():
            def body(i, carry):
                acc, xx = carry
                xx = xx * (1.0 + 1e-12 * i)
                return acc + f(v, xx).astype(jnp.float32), xx
            return lax.fori_loop(0, iters, body, (jnp.float32(0), x))[0]
        return lambda: run()
    t = slope(mk)
    print(f"{name:20s} {t:8.2f} ms/iter  ({B/t*1e3:6.1f} img/s)")
