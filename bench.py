#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): Cityscapes 2048x1024 images/sec/chip on the
flagship Fast-SCNN, bf16 inference on one chip. vs_baseline is the ratio to
the reference's paper-reported 123.5 fps @ 2048x1024 (TitanXp, the PyTorch
zoo's headline number — BASELINE.md).

Timing note: this environment reaches the TPU through a relay where
``block_until_ready`` can return early, so every jitted benchmark fn returns
a scalar checksum and the loop is closed with a 4-byte ``device_get`` —
device-order execution makes that a sync on the whole run.

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
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--mode", default="infer", choices=["infer", "train"])
    p.add_argument("--size", default="1024,2048")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
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

        @jax.jit
        def fwd(v, x):
            pred = jnp.argmax(nn.apply(model, v, x), axis=-1)
            return jnp.sum(pred, dtype=jnp.int32)  # checksum sync token

        def timed(n):
            s = None
            t0 = time.perf_counter()
            for _ in range(n):
                s = fwd(variables, images)
            jax.device_get(s)
            return time.perf_counter() - t0
    else:
        labels = jax.random.randint(jax.random.PRNGKey(2),
                                    (args.batch, h, w), 0, classes)
        loss_fn = lambda lg, lb: cross_entropy(lg, lb, num_classes=classes)
        tx = build_optimizer("adam", 1e-3)
        step = make_train_step(model, loss_fn, tx, compute_dtype=dtype,
                               donate=False)
        state = TrainState.create(variables, tx)
        batch = {"image": images, "label": labels}

        def timed(n):
            nonlocal state
            m = None
            t0 = time.perf_counter()
            for _ in range(n):
                state, m = step(state, batch, key)
            jax.device_get(m["loss"])
            return time.perf_counter() - t0

    timed(args.warmup)
    dt = timed(args.iters)

    ips = args.batch * args.iters / dt
    base = BASELINES_FPS.get(args.model.lower())
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
