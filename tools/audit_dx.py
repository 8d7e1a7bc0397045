"""Per-HLO-op audit of a train or inference step from a device trace.

VERDICT r4 items 1+2: the dX slab (42% of the b8 fastscnn train step)
had never been opened, and the six no-roof zoo rows rested on an
*inferred* lane-padding story. This tool joins the profiler trace's
per-op MEASURED device durations against each op's cost-analysis
metadata (bytes_accessed, model_flops, tf_op, source line), classifies
every op into fwd / dX / dW / loss / optimizer / other, and prints:

  - a phase table (measured ms per phase per step),
  - a conv-kind table (fwd conv, dX stride-1, dX base-dilated, dW),
  - the top-N ops by time with per-op achieved GB/s and MXU%,
    flagging memory-bound ops running far under the HBM roof
    (the lane-padding / layout-stall signature).

The fwd/bwd split needs no name heuristics: XLA's tf_op metadata marks
backward ops with ``transpose(jvp())``. Within backward convolutions,
``rhs_reversal`` (kernel flip) marks dX; ``lhs_dilate`` marks the
zero-insertion (base-dilated) dX of a STRIDED conv — the suspected
pathology (the forward fixes it with the subpixel lowering,
ops/convolution.py::conv2d_transpose_subpixel).

Run: python -m tools.audit_dx [--model fastscnn] [--batch 8]
     [--size 1024,2048] [--loss ce] [--mode train|infer] [--top 25]
     [--out benchmarks/audit_<model>_<mode>.json]
"""
import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GB_S = 819.0   # v5e HBM roof (BOUNDS.md)
MXU_TFLOPS = 197.0  # v5e bf16


def capture(step_fn, args_list, trace_dir, iters=2):
    out = step_fn(*args_list)  # compile + warm
    jax.block_until_ready(out)
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            out = step_fn(*args_list)
        jax.block_until_ready(out)
    path = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                            recursive=True))[-1]
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    return trace, iters


def device_op_events(trace):
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in trace["traceEvents"]
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    evs = []
    for e in trace["traceEvents"]:
        if e.get("ph") != "X" or "TPU" not in pid_names.get(e.get("pid"), ""):
            continue
        a = e.get("args", {})
        if "hlo_category" not in a:
            continue  # the step-level / queue lanes
        evs.append({
            "name": e["name"],
            "dur_ms": int(a.get("device_duration_ps", 0)) / 1e9,
            "bytes": int(a.get("bytes_accessed", 0) or 0),
            "flops": int(a.get("model_flops", 0) or 0),
            "cat": a.get("hlo_category", ""),
            "tf_op": a.get("tf_op", ""),
            "src": a.get("source", ""),
            "long": a.get("long_name", ""),
        })
    return evs


def phase_of(ev):
    t = ev["tf_op"]
    if "transpose(jvp(" in t:
        return "bwd"
    if "jvp(" in t:
        return "fwd"
    return "other"


import re

_SHAPE_RE = re.compile(r"(?:bf16|f32|f16|s32|u32|s8|u8)\[([0-9,]*)\]")


def shapes_in(long_name):
    """All shapes on the OUTPUT side of an HLO one-liner
    (``%f = (f32[3,3,3,32]{...}, ...) fusion(...)`` → [(3,3,3,32), ...]).
    The output side ends at the opcode-call token, not the first paren
    (the output tuple itself is parenthesized)."""
    head = long_name
    for op in (" fusion(", " convolution(", " dot(", " copy(", " custom-call("):
        head = head.split(op)[0]
    return [tuple(int(v) for v in m.group(1).split(",") if v)
            for m in _SHAPE_RE.finditer(head)]


def conv_kind(ev, phase, kernel_shapes):
    """Classify a convolution-fusion op.

    dW: the op's output tuple contains a 4D conv-kernel param shape
    (native-fallback dW), or its tf_op carries the custom dW-tap einsum
    signature. dX: any other backward conv; 'base-dilated' marks the
    zero-insertion dX of a STRIDED conv (lhs_dilate in the HLO window)
    — the pathology the forward fixes with the subpixel lowering."""
    ln = ev["long"]
    if "nhwc,nhwd->cd" in ev["tf_op"]:
        return "conv dW (taps)"
    if phase == "fwd":
        return "conv fwd"
    if phase != "bwd":
        return "conv other"
    for s in shapes_in(ln):
        if len(s) == 4 and s in kernel_shapes:
            return "conv dW (native)"
    if "lhs_dilate" in ln or "base-dilated" in ev["name"]:
        return "conv dX base-dilated"
    return "conv dX stride-1"


def summarize(evs, iters, kernel_shapes, top=25):
    per_phase = defaultdict(float)
    per_kind = defaultdict(lambda: [0.0, 0, 0])  # ms, bytes, flops
    agg = defaultdict(lambda: [0.0, 0, 0, 0])    # by (name): ms, bytes, flops, n
    total = 0.0
    for ev in evs:
        ph = phase_of(ev)
        d = ev["dur_ms"] / iters
        total += d
        per_phase[ph] += d
        if ev["cat"] == "convolution fusion":
            kind = conv_kind(ev, ph, kernel_shapes)
        elif ph == "other":
            # optimizer / BN-EMA / loss pieces outside jvp markers
            kind = f"other:{ev['cat']}"
        else:
            kind = f"{ph}:{ev['cat']}"
        k = per_kind[kind]
        k[0] += d
        k[1] += ev["bytes"] / iters
        k[2] += ev["flops"] / iters
        a = agg[ev["name"]]
        a[0] += d
        a[1] += ev["bytes"] / iters
        a[2] += ev["flops"] / iters
        a[3] += 1
        agg[ev["name"]].append(ev) if False else None
    # keep one representative ev per name for metadata
    meta = {}
    for ev in evs:
        meta.setdefault(ev["name"], ev)
    rows = []
    for name, (ms, byt, fl, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]:
        ev = meta[name]
        gbs = byt / 1e6 / ms if ms > 0 else 0.0
        mxu = fl / 1e9 / ms / MXU_TFLOPS * 100 if ms > 0 else 0.0
        rows.append({
            "name": name, "ms": round(ms, 3),
            "kind": (conv_kind(ev, phase_of(ev), kernel_shapes)
                     if ev["cat"] == "convolution fusion"
                     else f"{phase_of(ev)}:{ev['cat']}"),
            "GB_s": round(gbs, 1), "pct_HBM": round(100 * gbs / HBM_GB_S, 1),
            "pct_MXU": round(mxu, 1),
            "src": ev["src"].replace("/root/repo/", ""),
            "tf_op": ev["tf_op"][-60:],
        })
    return total, dict(per_phase), {k: (round(v[0], 3), v[1], v[2])
                                    for k, v in per_kind.items()}, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="fastscnn")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", default="1024,2048")
    ap.add_argument("--loss", default="ce")
    ap.add_argument("--mode", default="train", choices=["train", "infer"])
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    H, W = (int(v) for v in args.size.split(","))
    B = args.batch

    from esn_tpu import nn
    from esn_tpu.models import build_model

    model = build_model(args.model, 19)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 128, 128, 3), jnp.float32))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3), jnp.bfloat16)

    if args.mode == "train":
        from esn_tpu.train.losses import build_loss
        from esn_tpu.train.optimizers import build_optimizer
        from esn_tpu.train.state import TrainState
        from esn_tpu.train.step import make_train_step
        loss_fn = build_loss(args.loss, num_classes=19, ignore_index=255)
        tx = build_optimizer("adam", 1e-3)
        step = make_train_step(model, lambda lg, lb: loss_fn(lg, lb), tx,
                               compute_dtype=jnp.bfloat16, donate=False)
        state = TrainState.create(v, tx)
        y = jax.random.randint(jax.random.PRNGKey(2), (B, H, W), 0, 19)
        batch = {"image": x, "label": y}
        key = jax.random.PRNGKey(3)
        trace, iters = capture(lambda: step(state, batch, key), [],
                               f"/tmp/audit_{args.model}_train",
                               iters=args.iters)
    else:
        @jax.jit
        def fwd():
            return nn.apply(model, v, x, train=False, method="predict")
        trace, iters = capture(fwd, [], f"/tmp/audit_{args.model}_infer",
                               iters=args.iters)

    kernel_shapes = {tuple(p.shape)
                     for p in jax.tree_util.tree_leaves(v)
                     if hasattr(p, "shape") and len(p.shape) == 4}
    evs = device_op_events(trace)
    total, phases, kinds, rows = summarize(evs, iters, kernel_shapes,
                                           args.top)

    print(f"\n== {args.model} {args.mode} b{B} {H}x{W} {args.loss} — "
          f"measured device total {total:.2f} ms/step "
          f"({B / total * 1e3:.1f} img/s)\n")
    print("phase table (measured ms/step):")
    for ph, ms in sorted(phases.items(), key=lambda kv: -kv[1]):
        print(f"  {ph:8s} {ms:8.2f} ms  ({100 * ms / total:4.1f}%)")
    print("\nkind table (ms | logical GB/s | MXU%):")
    for kind, (ms, byt, fl) in sorted(kinds.items(), key=lambda kv: -kv[1][0]):
        if ms < total * 0.002:
            continue
        gbs = byt / 1e6 / ms if ms else 0
        mxu = fl / 1e9 / ms / MXU_TFLOPS * 100 if ms else 0
        print(f"  {kind:28s} {ms:8.2f} ms ({100 * ms / total:4.1f}%)"
              f"  {gbs:6.1f} GB/s ({100 * gbs / HBM_GB_S:5.1f}% HBM)"
              f"  {mxu:5.1f}% MXU")
    print(f"\ntop {args.top} ops by measured time:")
    for r in rows:
        print(f"  {r['ms']:8.3f} ms  {r['kind']:24s} {r['GB_s']:6.1f} GB/s"
              f" ({r['pct_HBM']:5.1f}%)  MXU {r['pct_MXU']:5.1f}%  "
              f"{r['src']:38s} {r['tf_op']}")

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"model": args.model, "mode": args.mode, "batch": B,
                       "size": [H, W], "loss": args.loss,
                       "total_ms": round(total, 2),
                       "img_per_s": round(B / total * 1e3, 1),
                       "phases_ms": {k: round(v, 2)
                                     for k, v in phases.items()},
                       "kinds": {k: {"ms": v[0],
                                     "GB_s": round(v[1] / 1e6 / v[0], 1)
                                     if v[0] else 0}
                                 for k, v in kinds.items()},
                       "top_ops": rows}, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
