"""Zoo-wide inference benchmark: every model at 2048x1024 bf16 on one chip.

Slope-timed (see tools/README.md). Tries batch 128 first, halving on
failure (memory / compile-helper ceiling). Writes a markdown table to
stdout and zoo_bench.json.

Run: ``python -m tools.bench_zoo [--size 1024,2048] [--models a,b,c]``
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp
from jax import lax

from esn_tpu import nn
from esn_tpu.models import build_model
from esn_tpu.models import available_models


def slope_time(model, variables, x, lo=4, hi=12):
    def mk(iters):
        @jax.jit
        def run(v, xx):
            def body(i, carry):
                acc, x_ = carry
                x_ = x_ * (1.0 + 1e-12 * i)
                pred = nn.apply(model, v, x_, method="predict")
                return acc + jnp.sum(pred, dtype=jnp.int32), x_
            return lax.fori_loop(0, iters, body, (jnp.int32(0), xx))[0]
        return run
    ts = {}
    for it in (lo, hi):
        r = mk(it)
        jax.device_get(r(variables, x))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            jax.device_get(r(variables, x))
            best = min(best, time.perf_counter() - t0)
        ts[it] = best
    return (ts[hi] - ts[lo]) / (hi - lo)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="1024,2048")
    p.add_argument("--models", default=",".join(available_models()))
    p.add_argument("--classes", type=int, default=19)
    p.add_argument("--seed_batches", default=None,
                   help="prior zoo_bench json: start each model at its "
                        "previously-working batch (skips known-failing "
                        "compile attempts)")
    p.add_argument("--out", default="zoo_bench.json")
    args = p.parse_args()
    h, w = (int(v) for v in args.size.split(","))

    seed = {}
    if args.seed_batches:
        with open(args.seed_batches) as f:
            for r in json.load(f)["rows"]:
                if r.get("batch"):
                    seed[r["model"]] = r["batch"]

    rows = []
    for name in args.models.split(","):
        model = build_model(name, args.classes)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 128, 128, 3), jnp.float32))
        result = None
        ladder = [b for b in (128, 64, 32, 16, 8, 4, 2, 1)
                  if b <= seed.get(name, 128)]
        for batch in ladder:
            x = jax.random.normal(jax.random.PRNGKey(1), (batch, h, w, 3),
                                  jnp.bfloat16)
            try:
                dt = slope_time(model, variables, x)
                from tools.fingerprint import graph_fingerprint
                fp = graph_fingerprint(jax.jit(
                    lambda v, xx: nn.apply(model, v, xx,
                                           method="predict")).lower(
                    variables, x))
                result = (batch, batch / dt, fp)
                break
            except Exception as e:  # noqa: BLE001 (OOM and relay faults)
                print(f"  {name} b{batch} failed: "
                      f"{str(e).splitlines()[0][:80]}", flush=True)
        rows.append({"model": name, "batch": result[0] if result else None,
                     "img_per_s": round(result[1], 1) if result else None,
                     "graph_fp": result[2] if result else None})
        print(f"{name:12s} "
              + (f"b{result[0]:2d}  {result[1]:7.1f} img/s" if result
                 else "FAILED"), flush=True)
        with open(args.out, "w") as f:  # incremental: survive crashes
            json.dump({"size": [h, w], "dtype": "bfloat16",
                       "device": str(jax.devices()[0]), "rows": rows}, f,
                      indent=1)
    print("| model | batch | img/s/chip |")
    print("|---|---|---|")
    for r in rows:
        print(f"| {r['model']} | {r['batch']} | {r['img_per_s']} |")


if __name__ == "__main__":
    main()
