#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): Cityscapes 2048x1024 images/sec/chip on the
flagship Fast-SCNN, bf16 inference on one chip. vs_baseline is the ratio to
the reference's paper-reported 123.5 fps @ 2048x1024 (TitanXp, the PyTorch
zoo's headline number — BASELINE.md).

Timing note: this environment reaches the TPU through a relay with a large
fixed per-call dispatch cost (~25-40 ms measured), so (a) the iteration loop
runs INSIDE one jit via ``lax.fori_loop`` (input perturbed per step so
nothing hoists or CSEs), (b) the reported time is the SLOPE between a low
and a high iteration count, which differences the relay cost out, and (c)
every jitted fn returns a scalar checksum closed with a 4-byte
``device_get`` (device-order execution makes that a sync on the whole run).

Usage: python bench.py [--model fastscnn] [--batch 8] [--mode infer|train]
"""
import argparse
import json
import sys
import time

BASELINES_FPS = {  # reference fps @ 2048x1024 (BASELINE.md; paper-reported)
    "fastscnn": 123.5,
    "contextnet": 65.0,
    # ENet paper reports 1280x720 @ 19fps (TitanX); 2048x1024 is 2.28x the
    # pixels -> ~8.3 fps extrapolated
    "enet": 8.3,
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="fastscnn")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--mode", default="infer", choices=["infer", "train"])
    p.add_argument("--size", default="1024,2048")
    p.add_argument("--iters_lo", type=int, default=6)
    p.add_argument("--iters_hi", type=int, default=24)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax import lax
    from esn_tpu.models import build_model
    from esn_tpu.train.losses import cross_entropy
    from esn_tpu.train.optimizers import build_optimizer
    from esn_tpu.train.state import TrainState
    from esn_tpu.train.step import make_train_step

    h, w = (int(v) for v in args.size.split(","))
    classes = 19
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    model = build_model(args.model, classes)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3), jnp.float32))

    key = jax.random.PRNGKey(1)
    images = jax.random.normal(key, (args.batch, h, w, 3), dtype)

    if args.mode == "infer":
        from esn_tpu import nn

        def make_run(iters):
            @jax.jit
            def run(v, x):
                def body(i, carry):
                    acc, xx = carry
                    xx = xx * (1.0 + 1e-12 * i)  # defeat CSE/hoisting
                    pred = nn.apply(model, v, xx, method="predict")
                    return acc + jnp.sum(pred, dtype=jnp.int32), xx
                acc, _ = lax.fori_loop(0, iters, body, (jnp.int32(0), x))
                return acc
            return run

        fixed_args = (variables, images)
    else:
        labels = jax.random.randint(jax.random.PRNGKey(2),
                                    (args.batch, h, w), 0, classes)
        loss_fn = lambda lg, lb: cross_entropy(lg, lb, num_classes=classes)
        tx = build_optimizer("adam", 1e-3)
        step = make_train_step(model, loss_fn, tx, compute_dtype=dtype,
                               donate=False)
        state0 = TrainState.create(variables, tx)
        batch = {"image": images, "label": labels}

        def make_run(iters):
            @jax.jit
            def run(state, batch):
                def body(i, carry):
                    st, acc = carry
                    b = {"image": batch["image"] * (1.0 + 1e-12 * i),
                         "label": batch["label"]}
                    st, m = step(st, b, key)
                    return st, acc + m["loss"]
                _, acc = lax.fori_loop(0, iters, body,
                                       (state, jnp.float32(0.0)))
                return acc
            return run

        fixed_args = (state0, batch)

    def best_time(iters):
        run = make_run(iters)
        jax.device_get(run(*fixed_args))  # compile + warm
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            jax.device_get(run(*fixed_args))
            best = min(best, time.perf_counter() - t0)
        return best

    lo, hi = args.iters_lo, args.iters_hi
    t_lo, t_hi = best_time(lo), best_time(hi)
    if t_hi <= t_lo:  # relay jitter swamped the work delta: widen the lever
        lo, hi = lo, hi * 4
        t_lo, t_hi = best_time(lo), best_time(hi)
    if t_hi <= t_lo:
        print(json.dumps({"metric": "error", "value": None,
                          "unit": "images/sec/chip", "vs_baseline": None,
                          "note": "non-monotonic timing; relay too noisy"}))
        return 1
    dt_per_iter = (t_hi - t_lo) / (hi - lo)

    ips = args.batch / dt_per_iter
    # the reference publishes inference fps only; train mode has no baseline
    base = BASELINES_FPS.get(args.model.lower()) \
        if args.mode == "infer" else None
    result = {
        "metric": f"{args.model}_{h}x{w}_{args.mode}_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / base, 3) if base else None,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
