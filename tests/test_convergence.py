"""End-to-end learning test: the full system must drive mIoU toward 1.0 on a
trivially learnable dataset (column-band labels). Catches silent bugs that
shape/parity tests can't: image/label misalignment in augmentation, loss
mis-weighting, BN stat corruption, LR schedule errors.

(Verified manually to reach mIoU 1.0 with ENet at 150 epochs; the budgeted
version below trains a smaller crop and asserts a generous floor.)
"""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def band_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("bands")
    (root / "camvid" / "images").mkdir(parents=True)
    rng = np.random.RandomState(7)

    def write(split, n):
        lines = []
        for i in range(n):
            lab = np.tile((np.arange(48) // 5 % 11).astype(np.uint8), (32, 1))
            img = (lab[..., None] * 20
                   + rng.randint(0, 25, (32, 48, 3))).astype(np.uint8)
            ip = f"images/{split}_{i}.png"
            lp = f"images/{split}_{i}_L.png"
            cv2.imwrite(str(root / "camvid" / ip), img)
            cv2.imwrite(str(root / "camvid" / lp), lab)
            lines.append(f"{ip} {lp}")
        (root / "camvid" / f"camvid_{split}_list.txt").write_text(
            "\n".join(lines))

    write("train", 8)
    write("val", 4)
    return str(root)


def test_enet_learns_to_high_miou(band_dataset, tmp_path):
    from esn_tpu.train.trainer import TrainConfig, Trainer
    cfg = TrainConfig(model="ENet", dataset="camvid",
                      data_root=band_dataset, input_size=(32, 48),
                      max_epochs=120, batch_size=4, val_epochs=120,
                      savedir=str(tmp_path), lr=5e-3,
                      random_scale=False, random_mirror=False,
                      num_workers=0)
    tr = Trainer(cfg)
    loss0, _ = tr.train_epoch(0)
    for e in range(1, cfg.max_epochs):
        loss, _ = tr.train_epoch(e)
    _, miou = tr.validate()
    assert loss < loss0 / 4, (loss0, loss)
    assert miou > 0.6, f"system failed to learn a trivial task: mIoU={miou}"
