"""Trace + op summary for a model's inference forward (see profile_train)."""
import glob
import gzip
import json
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp

from esn_tpu import nn
from esn_tpu.models import build_model
from esn_tpu.ops import argmax_lastdim

name = sys.argv[1] if len(sys.argv) > 1 else "espnet"
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
model = build_model(name, 19)
v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3), jnp.float32))
import os
hw = (int(os.environ.get("PH", 1024)), int(os.environ.get("PW", 2048)))
x = jax.random.normal(jax.random.PRNGKey(1), (batch, *hw, 3), jnp.bfloat16)

@jax.jit
def fwd(v, x):
    return jnp.sum(argmax_lastdim(nn.apply(model, v, x)))

jax.device_get(fwd(v, x))
with jax.profiler.trace("/tmp/infer_trace"):
    for _ in range(3):
        out = fwd(v, x)
    jax.device_get(out)

path = sorted(glob.glob("/tmp/infer_trace/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(path, "rt") as f:
    trace = json.load(f)
pid_names = {e["pid"]: e["args"].get("name", "") for e in trace["traceEvents"]
             if e.get("ph") == "M" and e.get("name") == "process_name"}
dur, cnt = defaultdict(float), defaultdict(int)
for e in trace["traceEvents"]:
    if e.get("ph") == "X" and "TPU" in pid_names.get(e.get("pid"), ""):
        n = e["name"].split(".")[0]
        dur[n] += e.get("dur", 0) / 1e3
        cnt[n] += 1
for n, d in sorted(dur.items(), key=lambda kv: -kv[1])[:15]:
    print(f"{d/3:9.2f} ms/step  x{cnt[n]//3:4d}  {n[:80]}")
