#!/usr/bin/env python
"""Evaluation CLI — reference ``test.py`` surface [R].

Loads a checkpoint, runs the val split, prints per-class IoU + mIoU.
``--best`` sweeps every checkpoint in the run dir for the best epoch;
``--save`` writes colorized predictions.
"""
import argparse
import os
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="esn_tpu evaluation")
    p.add_argument("--model", default="ENet")
    p.add_argument("--dataset", default="camvid",
                   choices=["cityscapes", "camvid"])
    p.add_argument("--checkpoint", default="")
    p.add_argument("--best", action="store_true",
                   help="sweep all checkpoints in the checkpoint's directory")
    p.add_argument("--save", action="store_true",
                   help="save colorized predictions")
    p.add_argument("--save_seg_dir", default="./result")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--data_root", default=None)
    p.add_argument("--synthetic_len", type=int, default=16)
    p.add_argument("--synthetic_hw", default=None, help="H,W synthetic source")
    p.add_argument("--compute_dtype", default=None)
    p.add_argument("--cuda", type=bool, default=True, help="[compat] ignored")
    p.add_argument("--gpus", default="0", help="[compat] ignored")
    return p.parse_args(argv)


def evaluate(model, variables, loader, eval_transform, spec, *,
             save_dir=None, dataset="camvid", compute_dtype=None):
    import jax.numpy as jnp
    import numpy as np
    from esn_tpu.data import palettes
    from esn_tpu.train.metrics import iou_from_confusion
    from esn_tpu.train.step import make_eval_step

    eval_step = make_eval_step(
        model, spec.num_classes, ignore_index=spec.ignore_label,
        compute_dtype=compute_dtype or jnp.float32)
    cm = np.zeros((spec.num_classes,) * 2, np.int64)
    for batch in loader:
        images = eval_transform(jnp.asarray(batch["image"]))
        pred, cm_b = eval_step(
            variables, {"image": images, "label": jnp.asarray(batch["label"])})
        cm += np.asarray(cm_b, np.int64)
        if save_dir:
            for i, name in enumerate(batch["name"]):
                palettes.save_predict(
                    np.asarray(pred[i]), np.asarray(batch["label"][i]),
                    name, dataset, save_dir, output_grey=False,
                    output_color=True)
    iou, miou = iou_from_confusion(jnp.asarray(cm))
    return np.asarray(iou), float(miou)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    from esn_tpu.data import build_dataset_test
    from esn_tpu.data.datasets import get_spec
    from esn_tpu.models import build_model
    from esn_tpu.train import checkpoint as ckpt

    kw = {"root": args.data_root} if args.data_root else {}
    if args.synthetic_hw:
        kw["synthetic_hw"] = tuple(
            int(v) for v in str(args.synthetic_hw).replace("x", ",").split(","))
    spec = get_spec(args.dataset)
    datas, loader, eval_transform = build_dataset_test(
        args.dataset, num_workers=args.num_workers, none_gt=False,
        batch_size=args.batch_size, synthetic_len=args.synthetic_len, **kw)

    model = build_model(args.model, spec.num_classes)
    # param shapes are spatial-size independent; init on a tiny sample
    sample = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sample)

    candidates = []
    if args.best and args.checkpoint:
        candidates = [p for _, p in
                      ckpt.list_checkpoints(os.path.dirname(args.checkpoint))]
    elif args.checkpoint:
        candidates = [args.checkpoint]

    dtype = jnp.bfloat16 if (args.compute_dtype == "bfloat16" or (
        args.compute_dtype is None and jax.default_backend() == "tpu")) \
        else jnp.float32

    if not candidates:
        print("=> no checkpoint given; evaluating random init")
        iou, miou = evaluate(model, variables, loader, eval_transform, spec,
                             save_dir=args.save_seg_dir if args.save else None,
                             dataset=args.dataset, compute_dtype=dtype)
        _report(iou, miou, args.dataset)
        return 0

    best = (None, -1.0)
    for path in candidates:
        vars_i, meta = ckpt.load_variables(path, variables)
        iou, miou = evaluate(model, vars_i, loader, eval_transform, spec,
                             save_dir=args.save_seg_dir if args.save else None,
                             dataset=args.dataset, compute_dtype=dtype)
        print(f"=> {os.path.basename(path)} (epoch {meta.get('epoch')}): "
              f"mIoU {miou:.4f}")
        if miou > best[1]:
            best = (path, miou)
            best_iou = iou
    print(f"=> best: {os.path.basename(best[0])} mIoU {best[1]:.4f}")
    _report(best_iou, best[1], args.dataset)
    return 0


def _report(iou, miou, dataset):
    from esn_tpu.data.palettes import CAMVID_CLASSES, CITYSCAPES_CLASSES
    names = CITYSCAPES_CLASSES if dataset == "cityscapes" else CAMVID_CLASSES
    for i, v in enumerate(iou):
        name = names[i] if i < len(names) else f"class{i}"
        print(f"  {name:>15s}: {v:.4f}")
    print(f"  {'meanIoU':>15s}: {miou:.4f}")


if __name__ == "__main__":
    sys.exit(main())
