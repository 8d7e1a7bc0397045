"""Tests for the tracing/profiling utilities (SURVEY.md §5)."""
import os

import jax.numpy as jnp
import numpy as np

from esn_tpu.utils import profiling


def test_step_timer_stats():
    t = profiling.StepTimer()
    assert t.summary() is None
    for _ in range(5):
        with t.step():
            np.zeros(1000).sum()
    s = t.summary()
    assert s["steps"] == 5
    assert 0 <= s["p50_ms"] <= s["p95_ms"] <= s["max_ms"]
    t.reset()
    assert t.summary() is None


def test_trace_writes_artifacts(tmp_path):
    logdir = str(tmp_path / "trace")
    with profiling.trace(logdir):
        with profiling.annotate("work"):
            jnp.sum(jnp.ones((64, 64))).block_until_ready()
    found = [f for _, _, fs in os.walk(logdir) for f in fs]
    assert found, "trace produced no files"


def test_trace_none_is_noop():
    with profiling.trace(None):
        pass
    with profiling.trace(""):
        pass


def test_nan_guard_restores_flag():
    import jax
    before = jax.config.jax_debug_nans
    try:
        with profiling.nan_guard():
            assert jax.config.jax_debug_nans is True
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert jax.config.jax_debug_nans == before


def test_trainer_emits_host_step_stats(tmp_path):
    from esn_tpu.train.trainer import TrainConfig, Trainer
    cfg = TrainConfig(model="ENet", dataset="camvid", input_size=(32, 48),
                      max_epochs=1, batch_size=2, val_epochs=1,
                      savedir=str(tmp_path), synthetic_len=4,
                      synthetic_hw=(32, 48), num_workers=0)
    tr = Trainer(cfg)
    tr.fit()
    import json
    events = [json.loads(l) for l in
              open(os.path.join(cfg.run_dir, "events.jsonl"))]
    assert any("host_step" in e for e in events)
    hs = next(e["host_step"] for e in events if "host_step" in e)
    assert hs["steps"] >= 1 and hs["mean_ms"] > 0
