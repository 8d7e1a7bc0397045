"""Roofline accounting for the shipped benchmark numbers (VERDICT r3 item 2).

For every zoo inference number and the headline training numbers, compute
which v5e roof the measured img/s sits against and how close:

- flops/img from XLA's HloCostAnalysis on the lowered (pre-optimization)
  HLO — conv/matmul flop counts are exact there and independent of the
  backend, so this runs cheaply on CPU without building the TPU graph.
- compulsory bytes/img = input + prediction output + one read of the
  params: a hard LOWER bound on HBM traffic (real fused executables move
  ~5-50x this in activations; the flagship's measured-true traffic is
  taken from the TPU executable's own cost analysis where available).

Roofs (TPU v5e, one chip): 197 TFLOP/s bf16 MXU, ~3.9 TFLOP/s VPU
(8x128 lanes x 4 ALUs x ~0.94 GHz — where depthwise convs run), and
819 GB/s HBM.

Writes benchmarks/roofline.json; `--md` regenerates the table in
BOUNDS.md. Run under CPU: JAX_PLATFORMS=cpu python -m tools.roofline
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MXU_PEAK = 197e12
VPU_PEAK = 3.9e12
HBM_PEAK = 819e9
H, W = 1024, 2048
CLASSES = 19


def _abstract_variables(model, dtype=None):
    """Variable pytree as ShapeDtypeStructs — lowering needs only shapes,
    so skip running init (23 s/model on this 1-core CPU)."""
    import jax
    import jax.numpy as jnp
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32)))
    if dtype is not None:
        shapes = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(
                a.shape, dtype if a.dtype == jnp.float32 else a.dtype),
            shapes)
    return shapes


def flops_per_img_infer(name):
    import jax
    import jax.numpy as jnp
    from esn_tpu import nn
    from esn_tpu.models import build_model
    model = build_model(name, CLASSES)
    cast = _abstract_variables(model, jnp.bfloat16)
    has_predict = hasattr(model, "predict")

    def fwd(v, x):
        return nn.apply(model, v, x, method="predict") if has_predict \
            else nn.apply(model, v, x)

    x = jax.ShapeDtypeStruct((1, H, W, 3), jnp.bfloat16)
    lowered = jax.jit(fwd).lower(cast, x)
    cost = lowered.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    n_params = sum(
        int(np.prod(a.shape))
        for a in jax.tree_util.tree_leaves(_abstract_variables(model)))
    return float(cost["flops"]), n_params


def flops_per_img_train(name, batch, loss):
    import jax
    import jax.numpy as jnp
    from esn_tpu.models import build_model
    from esn_tpu.train.losses import build_loss
    from esn_tpu.train.optimizers import build_optimizer
    from esn_tpu.train.schedules import poly_schedule
    from esn_tpu.train.state import TrainState
    from esn_tpu.train.step import make_train_step
    model = build_model(name, CLASSES)
    loss_fn = build_loss(loss, num_classes=CLASSES, ignore_index=255)
    sched = poly_schedule(4.5e-4, 1000)
    tx = build_optimizer("adam", sched)
    step = make_train_step(model, lambda lg, lb: loss_fn(lg, lb), tx,
                           schedule=sched, compute_dtype=jnp.bfloat16,
                           donate=False)
    state = jax.eval_shape(
        lambda: TrainState.create(
            model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 64, 64, 3), jnp.float32)), tx))
    batch_d = {"image": jax.ShapeDtypeStruct((batch, H, W, 3), jnp.float32),
               "label": jax.ShapeDtypeStruct((batch, H, W), jnp.int32)}
    key = jax.ShapeDtypeStruct(
        jax.eval_shape(lambda: jax.random.PRNGKey(0)).shape, jnp.uint32)
    lowered = jax.jit(step).lower(state, batch_d, key)
    cost = lowered.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    return float(cost["flops"]) / batch


def compulsory_bytes(n_params):
    # bf16 input + int32 prediction + one params read (bf16)
    return H * W * 3 * 2 + H * W * 4 + n_params * 2


def classify(img_s, flops, byt):
    tf = img_s * flops
    gb = img_s * byt
    mxu, vpu, hbm = tf / MXU_PEAK, tf / VPU_PEAK, gb / HBM_PEAK
    # raw (uncapped) VPU percentage — values >100 are meaningful: they
    # prove the MXU must carry the dense share (ADVICE r3: the old
    # min(.,10) clamp made "1000" ambiguous between ==1000 and >=1000)
    return {"TFLOP_s": round(tf / 1e12, 2),
            "pct_MXU_peak": round(100 * mxu, 1),
            "pct_VPU_peak_if_all_dw": round(100 * vpu, 1),
            "compulsory_GB_s": round(gb / 1e9, 1),
            "pct_HBM_floor": round(100 * hbm, 1)}


def tpu_pass(out_path, only=None, force=False):
    """Per-model TPU-executable cost analysis at the benched batch size:
    post-fusion flops + 'bytes accessed' (XLA's static traffic accounting
    for the REAL compiled program — the executables are compile-cached
    from the benchmarks, so this is cheap). Merges into roofline.json."""
    import jax
    import jax.numpy as jnp
    from esn_tpu import nn
    from esn_tpu.models import build_model
    with open(out_path) as f:
        data = json.load(f)
    for name, row in sorted(data["infer"].items()):
        if "error" in row or row.get("batch") is None:
            continue
        if only and name not in only:
            continue
        if not force and ("pct_HBM_roof" in row or "tpu_error" in row):
            continue  # already measured
        row.pop("tpu_error", None)
        try:
            model = build_model(name, CLASSES)
            v = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
            cast = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, v)
            b = row["batch"]

            def fwd(vv, x):
                return nn.apply(model, vv, x, method="predict")

            comp = jax.jit(fwd).lower(
                cast, jnp.zeros((b, H, W, 3), jnp.bfloat16)).compile()
            ca = comp.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            fl = ca["flops"] / b
            byt = ca["bytes accessed"] / b
            row["tpu_gflops_per_img"] = round(fl / 1e9, 2)
            row["tpu_MB_per_img"] = round(byt / 1e6, 1)
            row["achieved_GB_s"] = round(row["img_per_s"] * byt / 1e9, 1)
            row["pct_HBM_roof"] = round(
                100 * row["img_per_s"] * byt / HBM_PEAK, 1)
            row["pct_MXU_roof_fused"] = round(
                100 * row["img_per_s"] * fl / MXU_PEAK, 1)
        except Exception as e:
            row["tpu_error"] = str(e)[:160]
        print(name, {k: row.get(k) for k in
                     ("tpu_gflops_per_img", "tpu_MB_per_img",
                      "achieved_GB_s", "pct_HBM_roof", "tpu_error")})
        with open(out_path, "w") as f:  # save incrementally: compiles
            json.dump(data, f, indent=1)  # are minutes each
    print("merged TPU pass into", out_path)


def tpu_train_pass(out_path, only=None, force=False):
    """TPU-executable cost analysis of the REAL train step (fwd + bwd +
    Adam + BN EMA) at the benched batch size — fills the train rows with
    post-fusion flops and 'bytes accessed' so training gets the same roof
    accounting inference has (VERDICT r3 item 3). AOT: lower with abstract
    ShapeDtypeStructs, compile on the TPU, read cost_analysis — no real
    params are ever materialized."""
    import jax
    import jax.numpy as jnp
    from esn_tpu.models import build_model
    from esn_tpu.train.losses import build_loss
    from esn_tpu.train.optimizers import build_optimizer
    from esn_tpu.train.schedules import poly_schedule
    from esn_tpu.train.state import TrainState
    from esn_tpu.train.step import make_train_step
    with open(out_path) as f:
        data = json.load(f)
    for key, row in sorted(data["train"].items()):
        if "error" in row or row.get("batch") is None:
            continue
        # keys are f"{model}_{loss}"; loss names can be multi-token
        # (lovasz_hist), so match against the known loss set rather than
        # rsplit — rsplit turned fastscnn_lovasz_hist into model
        # "fastscnn_lovasz" and silently recorded a tpu_error (ADVICE r4)
        name, loss = row.get("model"), row.get("loss")
        if name is None or loss is None:
            from esn_tpu.train.losses import LOSS_REGISTRY
            for cand in sorted(LOSS_REGISTRY, key=len, reverse=True):
                if key.endswith("_" + cand):
                    name, loss = key[: -len(cand) - 1], cand
                    break
            else:
                name, loss = key.rsplit("_", 1)
        if only and name not in only:
            continue
        if not force and ("pct_HBM_roof" in row or "tpu_error" in row):
            continue
        row.pop("tpu_error", None)
        try:
            model = build_model(name, CLASSES)
            loss_fn = build_loss(loss, num_classes=CLASSES, ignore_index=255)
            sched = poly_schedule(4.5e-4, 1000)
            tx = build_optimizer("adam", sched)
            step = make_train_step(model, lambda lg, lb: loss_fn(lg, lb), tx,
                                   schedule=sched,
                                   compute_dtype=jnp.bfloat16, donate=False)
            state = jax.eval_shape(
                lambda: TrainState.create(
                    model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3), jnp.float32)), tx))
            b = row["batch"]
            batch_d = {"image": jax.ShapeDtypeStruct((b, H, W, 3),
                                                     jnp.float32),
                       "label": jax.ShapeDtypeStruct((b, H, W), jnp.int32)}
            kshape = jax.eval_shape(lambda: jax.random.PRNGKey(0))
            comp = jax.jit(step).lower(state, batch_d, kshape).compile()
            ca = comp.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            fl = ca["flops"] / b
            byt = ca["bytes accessed"] / b
            row["tpu_gflops_per_img"] = round(fl / 1e9, 2)
            row["tpu_MB_per_img"] = round(byt / 1e6, 1)
            row["achieved_GB_s"] = round(row["img_per_s"] * byt / 1e9, 1)
            row["pct_HBM_roof"] = round(
                100 * row["img_per_s"] * byt / HBM_PEAK, 1)
            row["pct_MXU_roof_fused"] = round(
                100 * row["img_per_s"] * fl / MXU_PEAK, 1)
        except Exception as e:
            row["tpu_error"] = str(e)[:160]
        print(key, {k: row.get(k) for k in
                    ("tpu_gflops_per_img", "tpu_MB_per_img",
                     "achieved_GB_s", "pct_HBM_roof", "tpu_error")})
        with open(out_path, "w") as f:
            json.dump(data, f, indent=1)
    print("merged TPU train pass into", out_path)


def binding_resource(row):
    """Name the roof a row sits against, from its own measured numbers."""
    hbm = row.get("pct_HBM_roof")
    mxu = max(row.get("pct_MXU_peak", 0), row.get("pct_MXU_roof_fused", 0))
    if hbm is None:
        return "(unmeasured)"
    if hbm >= 60:
        return f"HBM ({hbm:.0f}%)"
    if mxu >= 25:
        return f"MXU ({mxu:.0f}%)"
    if hbm >= 35:
        return f"mixed: HBM {hbm:.0f}% / MXU {mxu:.0f}%"
    return f"no roof (HBM {hbm:.0f}%, MXU {mxu:.0f}%)"


def emit_md(out_path):
    """Regenerate the BOUNDS.md zoo + training tables from roofline.json
    between the ROOFLINE:BEGIN/END markers — no hand-maintained numbers
    (VERDICT r3 item 4)."""
    with open(out_path) as f:
        data = json.load(f)
    lines = ["",
             "| model | img/s | batch | GF/img (pre-fusion) | %MXU | "
             "TPU MB/img | GB/s | %HBM roof | binding resource |",
             "|---|---|---|---|---|---|---|---|---|"]
    infer = {k: v for k, v in data["infer"].items() if "error" not in v}
    for name, r in sorted(infer.items(),
                          key=lambda kv: -(kv[1].get("img_per_s") or 0)):
        lines.append(
            f"| {name} | {r['img_per_s']} | {r['batch']} | "
            f"{r['gflops_per_img']} | {r['pct_MXU_peak']} | "
            f"{r.get('tpu_MB_per_img', '—')} | "
            f"{r.get('achieved_GB_s', '—')} | "
            f"{r.get('pct_HBM_roof', '—')} | {binding_resource(r)} |")
    lines += ["",
              "Training (full step: fwd+bwd+Adam+BN EMA, b = benched "
              "batch):", "",
              "| run | img/s | batch | GF/img | %MXU (fused) | TPU MB/img "
              "| GB/s | %HBM roof | binding resource |",
              "|---|---|---|---|---|---|---|---|---|"]
    for key, r in sorted(data["train"].items()):
        if "error" in r:
            continue
        lines.append(
            f"| {key} | {r['img_per_s']} | {r['batch']} | "
            f"{r['gflops_per_img']} | "
            f"{r.get('pct_MXU_roof_fused', r.get('pct_MXU_peak', '—'))} | "
            f"{r.get('tpu_MB_per_img', '—')} | "
            f"{r.get('achieved_GB_s', '—')} | "
            f"{r.get('pct_HBM_roof', '—')} | {binding_resource(r)} |")
    block = "\n".join(lines) + "\n"
    bounds = os.path.join(os.path.dirname(out_path), "..", "BOUNDS.md")
    bounds = os.path.abspath(bounds)
    with open(bounds) as f:
        text = f.read()
    beg, end = "<!-- ROOFLINE:BEGIN (tools/roofline.py --md) -->", \
               "<!-- ROOFLINE:END -->"
    if beg in text and end in text:
        pre, rest = text.split(beg, 1)
        _, post = rest.split(end, 1)
        text = pre + beg + "\n" + block + end + post
        with open(bounds, "w") as f:
            f.write(text)
        print("regenerated tables in", bounds)
    else:
        print(block)
        print(f"(markers not found in {bounds}; printed instead)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="merge TPU-executable bytes into existing json")
    ap.add_argument("--train", action="store_true",
                    help="with --tpu: measure the train step instead")
    ap.add_argument("--force", action="store_true",
                    help="with --tpu: re-measure rows that already have "
                         "TPU fields (use after a graph-changing commit)")
    ap.add_argument("--models", default=None,
                    help="comma list for --tpu (compiles are minutes each)")
    ap.add_argument("--md", action="store_true",
                    help="regenerate BOUNDS.md tables from the json")
    ap.add_argument("--out", default="benchmarks/roofline.json")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(repo, args.out)
    if args.md:
        emit_md(out_path)
        return
    if args.tpu:
        only = set(args.models.split(",")) if args.models else None
        if args.train:
            tpu_train_pass(out_path, only, force=args.force)
        else:
            tpu_pass(out_path, only, force=args.force)
        return
    # flops are backend-independent; force CPU so lowering never touches
    # the remote TPU compile helper (env vars alone are too late — this
    # environment pre-imports jax via sitecustomize, see tests/conftest.py)
    import jax
    jax.config.update("jax_platforms", "cpu")

    bench_dir = os.path.join(repo, "benchmarks")
    with open(os.path.join(bench_dir, "zoo_bench_2048x1024_bf16.json")) as f:
        infer = {r["model"]: r for r in json.load(f)["rows"]}

    out = {"roofs": {"MXU_bf16_TFLOP_s": 197, "VPU_TFLOP_s_approx": 3.9,
                     "HBM_GB_s": 819},
           "note": ("flops from HloCostAnalysis on unoptimized HLO "
                    "(exact for convs); bytes column is the COMPULSORY "
                    "floor (input+output+params), real traffic is higher"),
           "infer": {}, "train": {}}
    for name, row in sorted(infer.items()):
        try:
            fl, n_params = flops_per_img_infer(name)
        except Exception as e:  # keep going; record the failure
            out["infer"][name] = {"error": str(e)[:200]}
            continue
        byt = compulsory_bytes(n_params)
        out["infer"][name] = dict(
            img_per_s=row["img_per_s"], batch=row["batch"],
            gflops_per_img=round(fl / 1e9, 2), params=n_params,
            **classify(row["img_per_s"], fl, byt))
        print(name, json.dumps(out["infer"][name]))

    for fname, loss in (("zoo_train_2048x1024_bf16.json", "ce"),
                        ("zoo_train_ohem_2048x1024_bf16.json", "ohem")):
        path = os.path.join(bench_dir, fname)
        if not os.path.exists(path):
            continue
        for r in json.load(open(path))["rows"]:
            if loss == "ce" and r["model"] not in ("fastscnn", "contextnet"):
                continue
            key = f"{r['model']}_{loss}"
            try:
                fl = flops_per_img_train(r["model"], r["batch"], loss)
            except Exception as e:
                out["train"][key] = {"error": str(e)[:200]}
                continue
            _, n_params = flops_per_img_infer(r["model"])
            byt = compulsory_bytes(n_params) + H * W * 4  # + label read
            out["train"][key] = dict(
                model=r["model"], loss=loss,
                img_per_s=r["img_per_s"], batch=r["batch"],
                gflops_per_img=round(fl / 1e9, 2),
                **classify(r["img_per_s"], fl, byt))
            print(key, json.dumps(out["train"][key]))

    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
