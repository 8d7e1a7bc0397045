"""End-to-end CGNet predict time vs stage depth (true in-model block cost).

Run: python -m tools.bench_cgnet_depth M N [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

from esn_tpu import nn
from esn_tpu.models.cgnet import CGNet


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
        r = mk(it)
        jax.device_get(r(x))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            jax.device_get(r(x))
            best = min(best, time.perf_counter() - t0)
        ts[it] = best
    return (ts[hi] - ts[lo]) / (hi - lo) * 1e3


def main():
    m_, n_ = int(sys.argv[1]), int(sys.argv[2])
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 1024, 2048, 3),
                          jnp.bfloat16)
    model = CGNet(19, m=m_, n=n_)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3),
                                                    jnp.float32))
    t = slope(lambda z: nn.apply(model, v, z, method="predict"), x)
    print(f"m={m_} n={n_} b{B}: {t:8.2f} ms  {B / t * 1e3:6.1f} img/s",
          flush=True)


if __name__ == "__main__":
    main()
