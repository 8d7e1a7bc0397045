"""Tests for the native (C++) data-loading runtime.

Pins the libpng/libjpeg decode + resize against cv2 (the reference's decode
path [R: dataset/cityscapes.py cv2.imread]) and exercises the threaded
prefetch pipeline for ordering, shuffling, and label handling.
"""
import os

import numpy as np
import pytest

from esn_tpu.data import native

cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    recs = []
    for i, (h, w) in enumerate([(37, 53), (64, 48), (128, 96), (40, 40)]):
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        lab = rng.randint(0, 19, (h, w), np.uint8)
        ip = str(root / f"img_{i}.png")
        lp = str(root / f"lab_{i}.png")
        cv2.imwrite(ip, img)
        cv2.imwrite(lp, lab)
        recs.append((ip, lp))
    # one jpeg image
    jp = str(root / "img_j.jpg")
    cv2.imwrite(jp, rng.randint(0, 255, (50, 70, 3), np.uint8),
                [cv2.IMWRITE_JPEG_QUALITY, 95])
    return recs, jp


def test_png_decode_matches_cv2(images):
    recs, _ = images
    for ip, lp in recs:
        want = cv2.imread(ip, cv2.IMREAD_COLOR)
        got = native.decode_bgr(ip)
        np.testing.assert_array_equal(got, want)
        wantl = cv2.imread(lp, cv2.IMREAD_GRAYSCALE)
        gotl = native.decode_grey(lp)
        np.testing.assert_array_equal(gotl, wantl)


def test_jpeg_decode_matches_cv2(images):
    _, jp = images
    want = cv2.imread(jp, cv2.IMREAD_COLOR)
    got = native.decode_bgr(jp)
    assert got.shape == want.shape
    # different IDCT implementations: allow tiny per-pixel differences
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.mean() < 1.5 and diff.max() <= 16


def test_resize_matches_cv2(images):
    recs, _ = images
    ip, lp = recs[0]
    src = cv2.imread(ip, cv2.IMREAD_COLOR)
    want = cv2.resize(src, (32, 24), interpolation=cv2.INTER_LINEAR)
    got = native.decode_bgr(ip, (24, 32))
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1  # rounding-mode wiggle only

    srcl = cv2.imread(lp, cv2.IMREAD_GRAYSCALE)
    wantl = cv2.resize(srcl, (32, 24), interpolation=cv2.INTER_NEAREST)
    gotl = native.decode_grey(lp, (24, 32))
    np.testing.assert_array_equal(gotl, wantl)


def test_image_info(images):
    recs, _ = images
    assert native.image_info(recs[0][0]) == (37, 53)


def test_pipeline_in_order_with_labels(images):
    recs, _ = images
    pipe = native.NativePipeline(recs, (48, 48), threads=3, capacity=2)
    seen = []
    for rec, img, lab in pipe.epoch():
        assert img.shape == (48, 48, 3) and lab.shape == (48, 48)
        want = cv2.resize(cv2.imread(recs[rec][0], cv2.IMREAD_COLOR),
                          (48, 48), interpolation=cv2.INTER_LINEAR)
        assert np.abs(img.astype(int) - want.astype(int)).max() <= 1
        seen.append(rec)
    assert seen == list(range(len(recs)))
    pipe.close()


def test_pipeline_shuffled_epochs(images):
    recs, _ = images
    pipe = native.NativePipeline(recs, (32, 32), threads=2, capacity=8)
    order1 = [2, 0, 3, 1]
    got1 = [r for r, _, _ in pipe.epoch(order1)]
    assert got1 == order1
    order2 = [1, 3, 0, 2]
    got2 = [r for r, _, _ in pipe.epoch(order2)]
    assert got2 == order2
    pipe.close()


def test_pipeline_without_labels(images):
    recs, jp = images
    pipe = native.NativePipeline([(jp, None)], (40, 40), threads=1)
    out = list(pipe.epoch())
    assert len(out) == 1 and out[0][2] is None
    pipe.close()


def test_manifest_dataset_uses_native(images, monkeypatch):
    from esn_tpu.data.datasets import ManifestDataset, get_spec
    recs, _ = images
    ds = ManifestDataset(recs, get_spec("camvid"), resize_hw=(24, 32))
    item = ds[1]
    assert item["image"].shape == (24, 32, 3)
    assert item["label"].shape == (24, 32)
    # native off -> cv2 path gives (nearly) identical bytes
    monkeypatch.setenv("ESN_TPU_NATIVE", "0")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_build_attempted", False)
    item2 = ds[1]
    diff = np.abs(item["image"].astype(int) - item2["image"].astype(int))
    assert diff.max() <= 1
    np.testing.assert_array_equal(item["label"], item2["label"])
