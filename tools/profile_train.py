"""Capture + summarize a device trace of the full-res train step.

Writes /tmp/train_trace and prints the top-N ops by total device time,
parsed straight from the perfetto trace.json.gz (no tensorboard needed).
"""
import glob
import gzip
import json
from collections import defaultdict

import jax
import jax.numpy as jnp

from esn_tpu.models import build_model
from esn_tpu.train.losses import cross_entropy
from esn_tpu.train.optimizers import build_optimizer
from esn_tpu.train.state import TrainState
from esn_tpu.train.step import make_train_step

import sys
model = build_model(sys.argv[1] if len(sys.argv) > 1 else "fastscnn", 19)
v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3), jnp.float32))
tx = build_optimizer("adam", 1e-3)
step = make_train_step(model, lambda lg, lb: cross_entropy(lg, lb, num_classes=19),
                       tx, compute_dtype=jnp.bfloat16, donate=False)
state = TrainState.create(v, tx)
B, H, W = 8, int(sys.argv[2]) if len(sys.argv) > 2 else 1024, int(sys.argv[3]) if len(sys.argv) > 3 else 2048
batch = {"image": jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16),
         "label": jax.random.randint(jax.random.PRNGKey(2), (B, H, W), 0, 19)}
key = jax.random.PRNGKey(3)

state, m = step(state, batch, key)  # compile
jax.device_get(m["loss"])
with jax.profiler.trace("/tmp/train_trace"):
    for _ in range(3):
        state, m = step(state, batch, key)
    jax.device_get(m["loss"])

path = sorted(glob.glob("/tmp/train_trace/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(path, "rt") as f:
    trace = json.load(f)

# device-lane complete events, aggregated by name
dur = defaultdict(float)
cnt = defaultdict(int)
pid_names = {e["pid"]: e["args"].get("name", "") for e in trace["traceEvents"]
             if e.get("ph") == "M" and e.get("name") == "process_name"}
for e in trace["traceEvents"]:
    if e.get("ph") == "X" and "TPU" in pid_names.get(e.get("pid"), ""):
        name = e["name"].split(".")[0]
        dur[name] += e.get("dur", 0) / 1e3
        cnt[name] += 1
total = sum(dur.values())
print(f"total device time {total:.1f} ms over 3 steps  ({total/3:.1f} ms/step)")
for name, d in sorted(dur.items(), key=lambda kv: -kv[1])[:22]:
    print(f"{d/3:9.2f} ms/step  x{cnt[name]//3:4d}  {name[:90]}")
