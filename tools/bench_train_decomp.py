"""Full-res train-step decomposition (VERDICT r3 item 5 — the 5%-MFU
question): split a 2048x1024 training step into forward / dX / dW /
optimizer+BN slices and name the binding piece.

Measured variants (slope-timed inside one jit, see tools/README.md):
  fwd eval        — inference forward (argmax tail)
  fwd train       — forward with BN batch stats + loss
  fwd+dX          — backward wrt the INPUT only (params stopped):
                    adds the transposed-conv data path, no weight grads
  fwd+bwd         — full vjp (dX + dW)
  full step       — make_train_step: fwd+bwd + Adam + BN EMA + donate

So:  dX cost = (fwd+dX) - (fwd train);  dW cost = (fwd+bwd) - (fwd+dX);
     optimizer/EMA = (full step) - (fwd+bwd).

Run: python -m tools.bench_train_decomp [--model fastscnn] [--batch 8]
     [--size 1024,2048] [--loss ce]
"""
import argparse
import time

import jax
import jax.numpy as jnp
from jax import lax

from esn_tpu import nn
from esn_tpu.models import build_model
from esn_tpu.train.losses import build_loss
from esn_tpu.train.optimizers import build_optimizer
from esn_tpu.train.schedules import poly_schedule
from esn_tpu.train.state import TrainState
from esn_tpu.train.step import make_train_step


def slope(mk, lo=4, hi=12):
    ts = {}
    for it in (lo, hi):
        r = mk(it)
        jax.device_get(r())
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            jax.device_get(r())
            best = min(best, time.perf_counter() - t0)
        ts[it] = best
    return (ts[hi] - ts[lo]) / (hi - lo) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="fastscnn")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", default="1024,2048")
    ap.add_argument("--loss", default="ce")
    args = ap.parse_args()
    H, W = (int(v) for v in args.size.split(","))
    B = args.batch

    model = build_model(args.model, 19)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 128, 128, 3), jnp.float32))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)
    y = jax.random.randint(jax.random.PRNGKey(2), (B, H, W), 0, 19)
    key = jax.random.PRNGKey(3)
    loss_fn = build_loss(args.loss, num_classes=19, ignore_index=255)

    def train_loss(variables, xx):
        logits, _ = nn.apply(model, variables, xx, train=True, mutable=True,
                             rngs={"dropout": key})
        return loss_fn(logits.astype(jnp.float32), y)

    def fwd_eval(vv, xx):
        return jnp.sum(jnp.argmax(nn.apply(model, vv, xx), -1))

    def fwd_train(vv, xx):
        return train_loss(vv, xx)

    def fwd_dx(vv, xx):
        # params stopped: only the data-gradient (dX) path is built.
        # Differentiate wrt an f32 leaf but cast back to the bench dtype
        # INSIDE the differentiated fn, so the forward (and hence the conv
        # kernels, which follow x.dtype) runs in the same bf16 as the other
        # variants — otherwise dX is inflated by an f32-vs-bf16 forward
        # delta and dW correspondingly deflated (ADVICE r3, medium).
        frozen = jax.tree_util.tree_map(lax.stop_gradient, vv)
        l, gx = jax.value_and_grad(
            lambda xi: train_loss(frozen, xi.astype(xx.dtype)))(
                xx.astype(jnp.float32))
        # consume the WHOLE input gradient — summing a single element
        # lets XLA slice-DCE parts of the dX chain
        return l + jnp.sum(gx.astype(jnp.float32))

    def fwd_bwd(vv, xx):
        def loss(params):
            return train_loss({**vv, "params": params}, xx)
        l, g = jax.value_and_grad(loss)(vv["params"])
        # consume EVERY dW leaf: summing only the first let XLA DCE the
        # rest of the weight-gradient computation (measured: "fwd+bwd"
        # came out FASTER than "fwd+dX", which is impossible)
        return l + sum(jnp.sum(t).astype(jnp.float32)
                       for t in jax.tree_util.tree_leaves(g))

    rows = []
    for name, f in (("fwd eval", fwd_eval), ("fwd train(BN+loss)", fwd_train),
                    ("fwd+dX", fwd_dx), ("fwd+bwd", fwd_bwd)):
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
        rows.append((name, t))
        print(f"{name:20s} {t:8.2f} ms/iter  ({B / t * 1e3:6.1f} img/s)",
              flush=True)

    # full production step (Adam + BN EMA + schedule), one step per iter
    sched = poly_schedule(4.5e-4, 1000)
    tx = build_optimizer("adam", sched)
    step = make_train_step(model, lambda lg, lb: loss_fn(lg, lb), tx,
                           schedule=sched, compute_dtype=jnp.bfloat16,
                           donate=False)
    state = TrainState.create(v, tx)
    batch = {"image": x.astype(jnp.float32), "label": y}

    def mk_full(iters):
        @jax.jit
        def run(st, bt):
            # bt is an ARGUMENT: closing over the 200 MB batch bakes it
            # into the compile request as a literal (remote compile
            # helper rejects with HTTP 413)
            def body(carry, i):
                s, _ = carry
                b = {"image": bt["image"] * (1.0 + 1e-12 * i),
                     "label": bt["label"]}
                s, m = step(s, b, jax.random.fold_in(key, i))
                return (s, m["loss"]), None
            (s, last), _ = lax.scan(body, (st, jnp.float32(0)),
                                    jnp.arange(iters))
            return s.step, last
        return lambda: run(state, batch)
    t = slope(mk_full)
    rows.append(("full step", t))
    print(f"{'full step':20s} {t:8.2f} ms/iter  ({B / t * 1e3:6.1f} img/s)",
          flush=True)

    d = dict(rows)
    print("\nderived slices (ms):")
    print(f"  BN+loss over eval fwd : {d['fwd train(BN+loss)'] - d['fwd eval']:7.2f}")
    print(f"  dX (data grad)        : {d['fwd+dX'] - d['fwd train(BN+loss)']:7.2f}")
    print(f"  dW (weight grad)      : {d['fwd+bwd'] - d['fwd+dX']:7.2f}")
    print(f"  optimizer+EMA+sched   : {d['full step'] - d['fwd+bwd']:7.2f}")


if __name__ == "__main__":
    main()
