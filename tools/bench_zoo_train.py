"""Zoo-wide TRAINING benchmark: full train step (fwd+bwd+optimizer+BN stats)
per model at full-res 2048x1024 bf16 on one chip.

Slope-timed with the step body inside one jitted lax.scan (tools/README.md:
the axon relay costs ~25-40 ms per dispatched call, so per-call timing of
a train step would be relay-bound at small batch). Tries batches high to
low; on failure falls back, then retries the smallest batch with --remat.

Run: ``python -m tools.bench_zoo_train [--size 1024,2048] [--models a,b]
[--loss ce|ohem] [--schedule poly] [--batches 8,4,2,1]``
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp
from jax import lax

from esn_tpu.models import available_models, build_model
from esn_tpu.train.losses import build_loss
from esn_tpu.train.optimizers import build_optimizer
from esn_tpu.train.schedules import poly_schedule
from esn_tpu.train.state import TrainState
from esn_tpu.train.step import make_train_step


def make_runner(model, variables, *, loss="ce", classes=19, remat=False,
                lr=4.5e-4):
    from esn_tpu.train.losses import fused_resize_ce_spec
    fused, fwd_method = fused_resize_ce_spec(model, loss)
    if fused is not None:  # same path the Trainer builds
        loss_fn = lambda lg, lb: fused(lg, lb, num_classes=classes,
                                       ignore_index=255)
    else:
        loss_fn = build_loss(loss, num_classes=classes, ignore_index=255)
    sched = poly_schedule(lr, 1000)
    tx = build_optimizer("adam", sched)
    step = make_train_step(model, lambda lg, lb: loss_fn(lg, lb),
                           tx, schedule=sched,
                           compute_dtype=jnp.bfloat16, donate=False,
                           remat=remat, fwd_method=fwd_method)
    state = TrainState.create(variables, tx)

    def mk(iters):
        @jax.jit
        def run(st, batch, rng):
            def body(carry, i):
                b = {"image": batch["image"] * (1.0 + 1e-12 * i),
                     "label": batch["label"]}
                s, m = step(carry[0], b, jax.random.fold_in(rng, i))
                return (s, m["loss"]), None
            (s, last), _ = lax.scan(body, (st, jnp.float32(0)),
                                    jnp.arange(iters))
            return s.step, last
        return run

    return state, mk, step


def slope_time(state, mk, batch, rng, lo=2, hi=6):
    ts = {}
    for it in (lo, hi):
        r = mk(it)
        jax.device_get(r(state, batch, rng))  # compile + warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            jax.device_get(r(state, batch, rng))
            best = min(best, time.perf_counter() - t0)
        ts[it] = best
    return (ts[hi] - ts[lo]) / (hi - lo)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="1024,2048")
    p.add_argument("--models", default=",".join(available_models()))
    p.add_argument("--classes", type=int, default=19)
    p.add_argument("--loss", default="ce")
    p.add_argument("--batches", default="8,4,2,1")
    p.add_argument("--out", default="zoo_train_bench.json")
    args = p.parse_args()
    h, w = (int(v) for v in args.size.split(","))
    batches = [int(b) for b in args.batches.split(",")]

    rows = []
    for name in args.models.split(","):
        model = build_model(name, args.classes)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 128, 128, 3), jnp.float32))
        result = None
        for remat in (False, True):
            for batch in batches:
                kx, ky = jax.random.split(jax.random.PRNGKey(1))
                b = {"image": jax.random.normal(kx, (batch, h, w, 3),
                                                jnp.bfloat16),
                     "label": jax.random.randint(ky, (batch, h, w), 0,
                                                 args.classes, jnp.int32)}
                # retry once: the remote compile helper occasionally
                # crashes ("HTTP 500 ... subprocess exited") on graphs
                # that compile fine on a second attempt — without the
                # retry a transient permanently drops the model down the
                # batch ladder and underrecords it ~2x (observed r4:
                # cgnet/dabnet b8, both fine in r3)
                for attempt in (0, 1):
                    try:
                        state, mk, step = make_runner(model, variables,
                                                      loss=args.loss,
                                                      classes=args.classes,
                                                      remat=remat)
                        dt = slope_time(state, mk, b, jax.random.PRNGKey(2))
                        # graph identity for this row (tools/fingerprint):
                        # lets the next round distinguish "compile ceiling
                        # moved" from "the repo changed the graph"
                        from tools.fingerprint import graph_fingerprint
                        fp = graph_fingerprint(jax.jit(step).lower(
                            state, b, jax.random.PRNGKey(2)))
                        result = (batch, batch / dt, remat, fp)
                        break
                    except Exception as e:  # noqa: BLE001 (OOM, relay)
                        print(f"  {name} b{batch} remat={remat} "
                              f"attempt {attempt} failed: "
                              f"{str(e).splitlines()[0][:90]}", flush=True)
                if result:
                    break
            if result:
                break
        rows.append({"model": name,
                     "batch": result[0] if result else None,
                     "img_per_s": round(result[1], 1) if result else None,
                     "remat": result[2] if result else None,
                     "graph_fp": result[3] if result else None})
        print(f"{name:12s} "
              + (f"b{result[0]:2d}{' remat' if result[2] else '':6s}"
                 f" {result[1]:7.1f} img/s" if result else "FAILED"),
              flush=True)
        with open(args.out, "w") as f:  # incremental: survive crashes
            json.dump({"size": [h, w], "dtype": "bfloat16",
                       "loss": args.loss,
                       "device": str(jax.devices()[0]), "rows": rows}, f,
                      indent=1)
    print("| model | batch | train img/s/chip | remat |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['model']} | {r['batch']} | {r['img_per_s']} "
              f"| {r['remat']} |")


if __name__ == "__main__":
    main()
