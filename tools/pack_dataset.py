"""Pack a manifest dataset into raw ``.npy`` records for codec-free loading.

PNG decode binds the host at full-res serving rates: one core decodes
~14.6 img/s @ 2048x1024 while the flagship consumes >1400 img/s/chip
(benchmarks/host_loader.json). Pre-packing each (image, label) pair as a
single contiguous ``(H, W, 4)`` uint8 ``.npy`` (BGR + label plane, no
codec) loads at ~852 img/s/core — 58x PNG. This tool converts a dataset
root in the reference list-file convention [R: dataset/*_list.txt] into a
parallel packed root that every CLI accepts via ``--data_root``:

    python -m tools.pack_dataset --dataset camvid --root dataset \
        [--out dataset_packed] [--splits train,val,test]

The packed root mirrors the list-file convention (``<out>/<ds>/
<ds>_<split>_list.txt`` pointing at ``.npy`` records), so
``train.py --data_root <out>`` just works; ``esn_tpu/data/datasets.py::
ManifestDataset._get_packed`` is the consuming side. Labels must fit
uint8 (trainIDs do: Cityscapes ignore=255, CamVid ignore=11).
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from esn_tpu.data.datasets import ManifestDataset, get_spec, read_manifest


def pack_split(root, out_root, dataset, split):
    list_path = os.path.join(root, dataset, f"{dataset}_{split}_list.txt")
    if not os.path.exists(list_path):
        return None
    spec = get_spec(dataset)
    ds_root = os.path.join(root, dataset)
    records = read_manifest(list_path, ds_root)
    ds = ManifestDataset(records, spec)
    out_ds = os.path.join(out_root, dataset)
    os.makedirs(os.path.join(out_ds, "packed"), exist_ok=True)
    lines = []
    for i in range(len(ds)):
        item = ds[i]
        stem = os.path.splitext(item["name"])[0]
        rel = os.path.join("packed", f"{split}_{stem}.npy")
        if "label" in item:
            lab = item["label"]
            if lab.max() > 255:
                raise ValueError(f"label {stem} exceeds uint8")
            arr = np.concatenate(
                [item["image"], lab.astype(np.uint8)[..., None]], axis=-1)
        else:
            arr = item["image"]
        np.save(os.path.join(out_ds, rel), np.ascontiguousarray(arr))
        lines.append(rel)
    out_list = os.path.join(out_ds, f"{dataset}_{split}_list.txt")
    with open(out_list, "w") as f:
        f.write("\n".join(lines) + "\n")
    return len(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--root", default="dataset")
    ap.add_argument("--out", default=None,
                    help="packed root (default: <root>_packed)")
    ap.add_argument("--splits", default="train,val,trainval,test")
    args = ap.parse_args()
    out_root = args.out or args.root.rstrip("/") + "_packed"
    total = 0
    for split in args.splits.split(","):
        n = pack_split(args.root, out_root, args.dataset, split)
        if n is None:
            print(f"{split}: no list file, skipped")
        else:
            print(f"{split}: packed {n} records")
            total += n
    # the inform pickle is recomputed from packed records on first use
    # (identical stats — decode is bit-exact); copy if one already exists
    src = os.path.join(args.root, "inform", f"{args.dataset}_inform.pkl")
    if os.path.exists(src):
        import shutil
        os.makedirs(os.path.join(out_root, "inform"), exist_ok=True)
        shutil.copy2(src, os.path.join(out_root, "inform",
                                       f"{args.dataset}_inform.pkl"))
        print("copied inform pickle")
    print(f"packed {total} records under {out_root}")


if __name__ == "__main__":
    main()
