"""Data pipeline tests: inform formula, on-device augmentation, loaders,
palettes, builders (synthetic fallback)."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esn_tpu import data as D


def test_class_weight_formula():
    hist = np.array([900, 90, 10], np.int64)
    w = D.compute_class_weights(hist, norm_val=1.10)
    p = hist / hist.sum()
    ref = 1.0 / np.log(1.10 + p)
    np.testing.assert_allclose(w, ref.astype(np.float32), rtol=1e-6)
    # rarer class -> larger weight
    assert w[2] > w[1] > w[0]


def test_collect_stats_and_label_guard():
    spec = D.get_spec("camvid")
    ds = D.SyntheticDataset(spec, length=4, hw=(64, 96))
    stats = D.collect_stats(ds.stats_samples(), spec.num_classes,
                            spec.ignore_label)
    assert stats["classWeights"].shape == (11,)
    assert stats["mean"].shape == (3,) and stats["std"].shape == (3,)
    assert 0 < stats["mean"].mean() < 255

    def bad_samples():
        yield np.zeros((4, 4, 3), np.uint8), np.full((4, 4), 200, np.int32)

    with pytest.raises(ValueError):
        D.collect_stats(bad_samples(), 11, 11)


def test_inform_cache_roundtrip():
    spec = D.get_spec("camvid")
    ds = D.SyntheticDataset(spec, length=2, hw=(32, 32))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "camvid_inform.pkl")
        s1 = D.load_or_compute_inform(path, ds.stats_samples, 11, 11)
        assert os.path.exists(path)
        s2 = D.load_or_compute_inform(path, lambda: 1 / 0, 11, 11)  # cache hit
        np.testing.assert_array_equal(s1["classWeights"], s2["classWeights"])


def test_augment_shapes_and_ignore_fill(rng):
    mean = np.array([90.0, 100.0, 110.0], np.float32)
    aug = D.make_augment_fn(crop_hw=(64, 96), source_hw=(80, 120),
                            mean=mean, ignore_label=11,
                            scales=(0.5, 1.0, 2.0))
    images = (rng.rand(4, 80, 120, 3) * 255).astype(np.uint8)
    labels = rng.randint(0, 11, (4, 80, 120)).astype(np.int32)
    for seed in range(6):
        x, y = aug(jax.random.PRNGKey(seed), jnp.asarray(images),
                   jnp.asarray(labels))
        assert x.shape == (4, 64, 96, 3) and x.dtype == jnp.float32
        assert y.shape == (4, 64, 96) and y.dtype == jnp.int32
        yv = np.asarray(y)
        assert ((0 <= yv) & ((yv < 11) | (yv == 11))).all()
    # scale 0.5 needs a 128x192 source crop from an 80x120 image -> padding
    # with ignore_label must appear for some seeds
    seen_ignore = False
    for seed in range(10):
        _, y = aug(jax.random.PRNGKey(seed), jnp.asarray(images),
                   jnp.asarray(labels))
        if (np.asarray(y) == 11).any():
            seen_ignore = True
    assert seen_ignore


def test_augment_mirror_and_determinism(rng):
    mean = np.zeros(3, np.float32)
    aug = D.make_augment_fn(crop_hw=(32, 32), source_hw=(32, 32), mean=mean,
                            ignore_label=255, random_scale=False,
                            random_mirror=True)
    images = (rng.rand(2, 32, 32, 3) * 255).astype(np.uint8)
    labels = rng.randint(0, 5, (2, 32, 32)).astype(np.int32)
    x1, y1 = aug(jax.random.PRNGKey(0), jnp.asarray(images),
                 jnp.asarray(labels))
    x2, y2 = aug(jax.random.PRNGKey(0), jnp.asarray(images),
                 jnp.asarray(labels))
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    # label content preserved up to mirroring: histograms identical
    for b in range(2):
        np.testing.assert_array_equal(
            np.sort(np.asarray(y1[b]).ravel()),
            np.sort(labels[b].ravel()))


def test_batch_loader_and_prefetch():
    spec = D.get_spec("camvid")
    ds = D.SyntheticDataset(spec, length=10, hw=(32, 48))
    loader = D.BatchLoader(ds, 4, shuffle=True, drop_last=True, seed=0)
    batches = list(loader)
    assert len(batches) == 2 == len(loader)
    assert batches[0]["image"].shape == (4, 32, 48, 3)
    assert batches[0]["label"].shape == (4, 32, 48)
    assert len(batches[0]["name"]) == 4

    # epoch reshuffle changes order
    loader.set_epoch(1)
    b2 = list(loader)
    assert not all(a["name"] == b["name"] for a, b in zip(batches, b2))

    got = list(D.device_prefetch(iter(batches)))
    assert len(got) == 2
    assert isinstance(got[0]["image"], jax.Array)


def test_palettes_and_save_predict(tmp_path):
    from esn_tpu.data import palettes as P
    mask = np.array([[0, 1], [18, 255]], np.uint8)
    rgb = P.colorize_mask(mask, P.CITYSCAPES_PALETTE)
    assert rgb.shape == (2, 2, 3)
    np.testing.assert_array_equal(rgb[0, 0], [128, 64, 128])
    np.testing.assert_array_equal(rgb[1, 1], [0, 0, 0])

    lab = P.trainid_to_labelid(mask)
    assert lab[0, 0] == 7 and lab[0, 1] == 8 and lab[1, 0] == 33

    P.save_predict(mask, mask, "frame_000.png", "cityscapes",
                   str(tmp_path), output_grey=True, output_color=True,
                   gt_color=True)
    assert (tmp_path / "frame_000.png").exists()
    assert (tmp_path / "frame_000_color.png").exists()
    assert (tmp_path / "frame_000_gt.png").exists()


def test_builders_synthetic_fallback(tmp_path):
    datas, train_loader, val_loader, aug, ev = D.build_dataset_train(
        "camvid", (64, 96), batch_size=2, root=str(tmp_path),
        synthetic_len=6)
    assert datas["classWeights"].shape == (11,)
    batch = next(iter(train_loader))
    x, y = aug(jax.random.PRNGKey(0), jnp.asarray(batch["image"]),
               jnp.asarray(batch["label"]))
    assert x.shape == (2, 64, 96, 3)

    datas2, test_loader, ev2 = D.build_dataset_test(
        "camvid", root=str(tmp_path), none_gt=True)
    b = next(iter(test_loader))
    assert "label" not in b


def test_manifest_parsing(tmp_path):
    img = tmp_path / "img.png"
    lab = tmp_path / "lab.png"
    from PIL import Image
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img)
    Image.fromarray(np.zeros((8, 8), np.uint8)).save(lab)
    lst = tmp_path / "list.txt"
    lst.write_text("img.png lab.png\nimg.png\n")
    recs = D.read_manifest(str(lst))
    assert len(recs) == 2
    assert recs[0][1] is not None and recs[1][1] is None

    spec = D.get_spec("camvid")
    ds = D.ManifestDataset(recs, spec)
    item = ds[0]
    assert item["image"].shape == (8, 8, 3)
    assert item["label"].shape == (8, 8)
    assert "label" not in ds[1]


def test_packed_npy_roundtrip_and_builders(tmp_path):
    """tools/pack_dataset.py output must load byte-identically to the PNG
    source and drive the builders end-to-end as a plain --data_root."""
    cv2 = pytest.importorskip("cv2")
    from tools.pack_dataset import pack_split

    root = tmp_path / "ds"
    ds_dir = root / "camvid"
    (ds_dir / "images").mkdir(parents=True)
    r = np.random.RandomState(3)
    for split, n, labeled in (("train", 4, True), ("val", 2, True),
                              ("test", 2, False)):
        lines = []
        for i in range(n):
            img = r.randint(0, 255, (40, 56, 3), np.uint8)
            cv2.imwrite(str(ds_dir / "images" / f"{split}_{i}.png"), img)
            if labeled:
                lab = r.randint(0, 11, (40, 56), np.uint8)
                cv2.imwrite(str(ds_dir / "images" / f"{split}_{i}_L.png"),
                            lab)
                lines.append(f"images/{split}_{i}.png "
                             f"images/{split}_{i}_L.png")
            else:
                lines.append(f"images/{split}_{i}.png")
        (ds_dir / f"camvid_{split}_list.txt").write_text(
            "\n".join(lines) + "\n")

    out_root = str(tmp_path / "packed")
    for split in ("train", "val", "test"):
        assert pack_split(str(root), out_root, "camvid", split) > 0

    spec = D.get_spec("camvid")
    src = D.ManifestDataset.from_list_file(
        str(ds_dir / "camvid_train_list.txt"), spec)
    packed = D.ManifestDataset.from_list_file(
        os.path.join(out_root, "camvid", "camvid_train_list.txt"), spec)
    for i in range(len(src)):
        a, b = src[i], packed[i]
        np.testing.assert_array_equal(a["image"], b["image"])  # bit-exact
        np.testing.assert_array_equal(a["label"], b["label"])
    # unlabeled test split packs as (H, W, 3)
    pt = D.ManifestDataset.from_list_file(
        os.path.join(out_root, "camvid", "camvid_test_list.txt"), spec)
    assert "label" not in pt[0]

    # e2e: the packed root is a drop-in --data_root
    datas, train_loader, _, aug, _ = D.build_dataset_train(
        "camvid", (32, 48), batch_size=2, root=out_root, num_workers=0)
    assert datas["classWeights"].shape == (11,)
    batch = next(iter(train_loader))
    x, y = aug(jax.random.PRNGKey(0), jnp.asarray(batch["image"]),
               jnp.asarray(batch["label"]))
    assert x.shape == (2, 32, 48, 3) and y.shape == (2, 32, 48)


def test_packed_separate_label_resolution_and_dtype(tmp_path):
    """A separately-packed label .npy at a DIFFERENT resolution than its
    image must still land on resize_hw, and an int-typed label must be
    cast before cv2.resize (which rejects int32/int64) — ADVICE r4."""
    pytest.importorskip("cv2")
    r = np.random.RandomState(7)
    img = r.randint(0, 255, (40, 56, 3), np.uint8)
    lab = r.randint(0, 11, (20, 28), np.int32)  # half-res, wrong dtype
    ip, lp = tmp_path / "img.npy", tmp_path / "lab.npy"
    np.save(ip, img)
    np.save(lp, lab)
    spec = D.get_spec("camvid")
    ds = D.ManifestDataset([(str(ip), str(lp))], spec, resize_hw=(40, 56))
    item = ds[0]
    assert item["image"].shape == (40, 56, 3)
    assert item["label"].shape == (40, 56)  # resized off its OWN shape
    assert item["label"].dtype == np.int32  # final contract dtype
    # nearest-neighbor upscale of a half-res label keeps the value set
    assert set(np.unique(item["label"])) <= set(np.unique(lab))

    # malformed separately-packed label: loud, not silent
    bad = tmp_path / "bad.npy"
    np.save(bad, r.randint(0, 11, (20, 28, 2), np.uint8))
    ds_bad = D.ManifestDataset([(str(ip), str(bad))], spec,
                               resize_hw=(40, 56))
    with pytest.raises(ValueError, match="packed label"):
        ds_bad[0]


def test_device_prefetch_consumer_abandons():
    """Abandoning the generator mid-epoch must retire the producer thread."""
    import threading
    from esn_tpu.data.loader import device_prefetch

    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield {"image": np.zeros((1, 4, 4, 3), np.float32)}

    before = threading.active_count()
    it = device_prefetch(gen(), size=2)
    next(it)
    it.close()  # GeneratorExit -> finally must stop + join the worker
    assert threading.active_count() <= before + 1
    assert len(produced) < 100  # producer did not run to completion
