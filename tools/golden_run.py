"""Golden end-to-end accuracy regression (VERDICT r2 item 3).

No Cityscapes/CamVid data and no reference outputs exist in this
environment, so the BASELINE mIoU-parity gate (+-0.2) cannot be exercised
directly. This pins the next-best thing: fixed-seed tiny real-image
training runs (real PNG decode -> on-device augment -> jitted train step ->
mesh-sharded eval) whose loss trajectories and final mIoU future rounds
must reproduce. Any silent interaction regression across the exact-rewrite
surface (folding, s2d stems, fused heads, scan chains, unpool side
channels) shows up as a drifted trajectory here long before real data
could reveal it.

Two configs cover the two riskiest dataflow families:
  - ENet: max-unpool encoder->decoder index side channel [SURVEY §3.4].
  - Fast-SCNN (the flagship): dsconv/PPM/FFM path + s2d train stem +
    fused prediction tail.

Usage (must run under the SAME platform as the test suite — 8 virtual CPU
devices; the script re-execs itself into that platform if needed):

    python -m tools.golden_run --write     # regenerate GOLDEN.json

`tests/test_golden_run.py` re-runs both configs and asserts the committed
numbers within a tight tolerance.
"""
import json
import os
import sys

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "GOLDEN.json")

# Fixture geometry: CamVid-like 11-class band dataset, deterministic
# content (fixed RandomState), written through the real PNG codec so the
# native/cv2 decode path is inside the pinned surface.
SRC_HW = (96, 128)
TRAIN_N, VAL_N = 8, 4

# Every config is tuned until the FINAL mIoU carries signal (VERDICT r3
# weak #4 / r4 weak #1: a 4-epoch run pins mIoU ~0.03-0.05, which a
# degenerate predictor matches — the loss trajectory carried all the
# regression weight). r5 sweeps (/tmp/golden_tune*.log method: epochs/lr
# grid at the tiny-fixture scale, full 96x128 input):
#   enet      40ep lr2e-2 -> mIoU 0.44, 11/11 classes nonzero
#   enet_ohem 40ep lr2e-2 -> mIoU 0.39, 11/11   (OHEM radix-select grad)
#   erfnet    72ep lr1e-2 -> mIoU 0.29, 10/11   (W->C lane folding)
#   fastscnn  24ep lr2e-2 -> mIoU ~0.5, 10/11   (dsconv/PPM/FFM + fused tail)
CONFIGS = {
    "enet": dict(model="ENet", dataset="camvid", input_size=(96, 128),
                 max_epochs=40, batch_size=4, lr=2e-2, val_epochs=40,
                 random_scale=True, random_mirror=True, num_workers=0,
                 seed=1),
    "fastscnn": dict(model="FastSCNN", dataset="camvid",
                     input_size=(96, 128), max_epochs=24, batch_size=4,
                     lr=2e-2, val_epochs=24, random_scale=True,
                     random_mirror=True, num_workers=0, seed=1),
    # pins the OHEM path: the IEEE-754 radix kth-select + kept-mask
    # gradient (losses.kth_smallest)
    "enet_ohem": dict(model="ENet", dataset="camvid", input_size=(96, 128),
                      max_epochs=40, batch_size=4, lr=2e-2, val_epochs=40,
                      loss="ohem", random_scale=True, random_mirror=True,
                      num_workers=0, seed=1),
    # pins the W->C lane-folding family (NonBottleneck1d, ops/folding.py)
    "erfnet": dict(model="ERFNet", dataset="camvid", input_size=(96, 128),
                   max_epochs=72, batch_size=4, lr=1e-2, val_epochs=72,
                   random_scale=True, random_mirror=True, num_workers=0,
                   seed=1),
}


def build_fixture(root):
    """Deterministic real-PNG CamVid-like dataset under `root`."""
    import cv2
    import numpy as np
    ds = os.path.join(root, "camvid")
    os.makedirs(os.path.join(ds, "images"), exist_ok=True)
    rng = np.random.RandomState(11)
    h, w = SRC_HW
    for split, n in (("train", TRAIN_N), ("val", VAL_N)):
        lines = []
        for i in range(n):
            lab = np.tile((np.arange(w) // 12 % 11).astype(np.uint8),
                          (h, 1))
            img = (lab[..., None] * 18
                   + rng.randint(0, 30, (h, w, 3))).astype(np.uint8)
            ip, lp = f"images/{split}_{i}.png", f"images/{split}_{i}_L.png"
            cv2.imwrite(os.path.join(ds, ip), img)
            cv2.imwrite(os.path.join(ds, lp), lab)
            lines.append(f"{ip} {lp}")
        with open(os.path.join(ds, f"camvid_{split}_list.txt"), "w") as f:
            f.write("\n".join(lines))
    return root


def run_one(name, data_root, savedir):
    from esn_tpu.train.trainer import TrainConfig, Trainer
    cfg = TrainConfig(data_root=data_root, savedir=savedir,
                      **CONFIGS[name])
    tr = Trainer(cfg)
    losses = []
    for e in range(cfg.max_epochs):
        loss, _ = tr.train_epoch(e)
        losses.append(float(loss))
    iou, miou = tr.validate()
    return {"losses": losses, "miou": float(miou),
            "per_class_iou": [round(float(v), 6) for v in iou]}


def run_all():
    import tempfile
    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        data_root = build_fixture(os.path.join(tmp, "ds"))
        for name in CONFIGS:
            results[name] = run_one(name, data_root,
                                    os.path.join(tmp, "ckpt", name))
    return results


def _reexec_on_virtual_cpu():
    """The golden numbers are defined on the test platform: 8 virtual CPU
    devices (tests/conftest.py). Re-exec if this process isn't there yet —
    env vars alone are too late once jax's backend is initialized."""
    if os.environ.get("JAX_PLATFORMS") == "cpu" and \
            "xla_force_host_platform_device_count=8" in \
            os.environ.get("XLA_FLAGS", ""):
        import jax
        jax.config.update("jax_platforms", "cpu")
        return False
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = " ".join(f for f in env.get("XLA_FLAGS", "").split()
                     if "xla_force_host_platform_device_count" not in f)
    env["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable,
              [sys.executable, "-m", "tools.golden_run"] + sys.argv[1:],
              env)


def main():
    _reexec_on_virtual_cpu()
    import jax
    results = run_all()
    payload = {"platform": "cpu x8 virtual (tests/conftest.py)",
               # recorded so the regression test can distinguish
               # upgrade-induced instruction-selection drift from real
               # regressions (ADVICE r3): version mismatch -> xfail
               "jax_version": jax.__version__,
               "fixture": {"src_hw": list(SRC_HW), "train_n": TRAIN_N,
                           "val_n": VAL_N, "rng_seed": 11},
               "configs": {k: dict(v, input_size=list(v["input_size"]))
                           for k, v in CONFIGS.items()},
               "results": results}
    if "--write" in sys.argv:
        with open(GOLDEN_PATH, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {GOLDEN_PATH}")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
