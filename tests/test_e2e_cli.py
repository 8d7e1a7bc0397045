"""End-to-end slice (BASELINE config 1 shape): ENet-on-CamVid-sized training
through the Trainer library + train/test/predict CLIs on synthetic data,
CPU inference + mIoU eval. Small shapes keep CPU runtime sane."""
import os

import jax
import numpy as np
import pytest

from esn_tpu.train.trainer import TrainConfig, Trainer

TINY = dict(
    dataset="camvid", input_size=(72, 96), max_epochs=2, batch_size=2,
    lr=2e-3, val_epochs=1, synthetic_len=6, synthetic_hw=(144, 192),
    num_workers=2, savedir=None,  # filled per-test
)


def make_cfg(tmp_path, **over):
    kw = dict(TINY)
    kw.update(over)
    kw["savedir"] = str(tmp_path / "ckpt")
    kw["data_root"] = str(tmp_path / "nodata")
    return TrainConfig(**kw)


def test_trainer_end_to_end(tmp_path):
    cfg = make_cfg(tmp_path, model="ENet")
    trainer = Trainer(cfg)
    assert trainer.n_params > 100_000
    miou = trainer.fit()
    assert 0.0 <= miou <= 1.0

    run = cfg.run_dir
    assert os.path.exists(os.path.join(run, "log.txt"))
    assert os.path.exists(os.path.join(run, "events.jsonl"))
    assert os.path.exists(os.path.join(run, "model_2.ckpt"))
    assert os.path.exists(os.path.join(run, "loss_vs_epochs.png"))

    # losses logged for both epochs and finite
    import json
    events = [json.loads(l) for l in
              open(os.path.join(run, "events.jsonl"))]
    assert len(events) == 2
    assert all(np.isfinite(e["loss"]) for e in events)

    # per-class IoU lines in log.txt at val epochs (reference log surface
    # [R: train.py]) and the per-class vector in events.jsonl
    log = open(os.path.join(run, "log.txt")).read()
    assert log.count(" IoU: ") >= 11  # one line per CamVid class
    val_events = [e for e in events if e.get("miou") is not None]
    assert val_events and all(
        len(e["per_class_iou"]) == 11 for e in val_events)


def test_trainer_resume(tmp_path):
    cfg = make_cfg(tmp_path, model="ENet", max_epochs=2, val_epochs=99)
    t1 = Trainer(cfg)
    t1.fit(epochs=1)
    ck = os.path.join(cfg.run_dir, "model_1.ckpt")
    assert os.path.exists(ck)

    cfg2 = make_cfg(tmp_path, model="ENet", max_epochs=2, val_epochs=99,
                    resume=ck)
    t2 = Trainer(cfg2)
    assert t2.start_epoch == 1
    assert int(jax.device_get(t2.state.step)) == int(
        jax.device_get(t1.state.step))
    t2.fit()
    assert os.path.exists(os.path.join(cfg2.run_dir, "model_2.ckpt"))


def test_cli_train_test_predict(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import sys
    sys.path.insert(0, "/root/repo")
    import train as train_cli
    import test as test_cli
    import predict as predict_cli

    rc = train_cli.main([
        "--model", "ENet", "--dataset", "camvid", "--input_size", "72,96",
        "--max_epochs", "2", "--batch_size", "2", "--val_epochs", "2",
        "--synthetic_len", "4", "--num_workers", "2",
        "--synthetic_hw", "144,192",
        "--savedir", str(tmp_path / "ck"), "--data_root",
        str(tmp_path / "none"), "--compute_dtype", "float32"])
    assert rc == 0
    # find checkpoints (one per epoch)
    run_dirs = []
    for root, dirs, files in os.walk(str(tmp_path / "ck")):
        for f in files:
            if f.endswith(".ckpt"):
                run_dirs.append(os.path.join(root, f))
    assert len(run_dirs) == 2
    ckpt_path = sorted(run_dirs)[-1]

    rc = test_cli.main([
        "--model", "ENet", "--dataset", "camvid",
        "--checkpoint", ckpt_path, "--synthetic_len", "2",
        "--synthetic_hw", "144,192",
        "--data_root", str(tmp_path / "none"),
        "--compute_dtype", "float32",
        "--save", "--save_seg_dir", str(tmp_path / "eval_saves")])
    assert rc == 0
    assert os.listdir(str(tmp_path / "eval_saves"))  # --save wrote masks

    # --best sweeps every model_*.ckpt in the run dir [R: test.py]
    rc = test_cli.main([
        "--model", "ENet", "--dataset", "camvid",
        "--checkpoint", ckpt_path, "--best", "--synthetic_len", "2",
        "--synthetic_hw", "144,192",
        "--data_root", str(tmp_path / "none"),
        "--compute_dtype", "float32"])
    assert rc == 0

    rc = predict_cli.main([
        "--model", "ENet", "--dataset", "camvid",
        "--checkpoint", ckpt_path, "--synthetic_len", "2",
        "--synthetic_hw", "144,192",
        "--save_seg_dir", str(tmp_path / "preds"),
        "--data_root", str(tmp_path / "none"),
        "--compute_dtype", "float32"])
    assert rc == 0
    preds = os.listdir(str(tmp_path / "preds"))
    assert any(p.endswith("_color.png") for p in preds)


def test_espnet_two_stage_encoder_graft(tmp_path):
    """Reference ESPNet recipe: pretrain ESPNet-C, graft into full ESPNet."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from esn_tpu.models import build_model
    from esn_tpu.train import checkpoint as ckpt
    from esn_tpu.train.optimizers import build_optimizer
    from esn_tpu.train.state import TrainState

    enc = build_model("espnet_c", 11)
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    v_enc = enc.init(jax.random.PRNGKey(7), x)
    tx = build_optimizer("adam", 1e-3)
    path = ckpt.save_checkpoint(str(tmp_path), 1, TrainState.create(v_enc, tx))

    full = build_model("espnet", 11)
    v_full = full.init(jax.random.PRNGKey(0), x)
    grafted, _ = ckpt.load_encoder(path, v_full)

    donor_leaf = jax.tree_util.tree_leaves(v_enc["params"])[0]
    grafted_leaf = jax.tree_util.tree_leaves(grafted["params"]["enc"])[0]
    np.testing.assert_array_equal(np.asarray(donor_leaf),
                                  np.asarray(grafted_leaf))
    # full forward still runs with the grafted tree
    from esn_tpu import nn
    out = nn.apply(full, grafted, x, train=False)
    assert out.shape == (1, 64, 96, 11)

    # trainer path: --encoder_checkpoint wires through config
    from esn_tpu.train.trainer import TrainConfig, Trainer
    cfg = TrainConfig(model="ESPNet", dataset="camvid", input_size=(64, 96),
                      max_epochs=1, batch_size=2, val_epochs=1,
                      savedir=str(tmp_path / "s2"), synthetic_len=2,
                      synthetic_hw=(64, 96), num_workers=0,
                      encoder_checkpoint=path)
    tr = Trainer(cfg)
    got = jax.tree_util.tree_leaves(
        jax.device_get(tr.state.params["enc"]))[0]
    np.testing.assert_array_equal(np.asarray(donor_leaf), got)
