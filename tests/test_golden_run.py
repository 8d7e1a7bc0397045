"""Golden end-to-end accuracy regression (VERDICT r2 item 3).

Re-runs the fixed-seed tiny real-image training configs from
tools/golden_run.py and asserts the loss trajectory + final mIoU match
the committed GOLDEN.json within a tight tolerance. This is the parity
insurance that stands in for the BASELINE +-0.2 mIoU gate while the
reference mount and datasets are absent: any silent interaction
regression across the exact-rewrite surface (folding, s2d, fused heads,
scan, unpool) drifts these trajectories.

Regenerate after an INTENTIONAL accuracy-affecting change with:
    python -m tools.golden_run --write
and say why in the commit message.
"""
import json
import os

import numpy as np
import pytest

pytest.importorskip("cv2")

from tools.golden_run import GOLDEN_PATH, CONFIGS, build_fixture, run_one

# CPU XLA is deterministic on a fixed machine/version; the tolerance only
# absorbs cross-version instruction-selection drift. A real behavior
# change (different augmentation stream, different lowering semantics,
# lost gradient term) moves losses by orders more than this.
LOSS_RTOL = 2e-3
MIOU_ATOL = 5e-3


@pytest.fixture(scope="module")
def golden():
    assert os.path.exists(GOLDEN_PATH), \
        "GOLDEN.json missing - run: python -m tools.golden_run --write"
    with open(GOLDEN_PATH) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    return build_fixture(str(tmp_path_factory.mktemp("golden_ds")))


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_golden_trajectory(name, golden, fixture_root, tmp_path):
    want = golden["results"][name]
    got = run_one(name, fixture_root, str(tmp_path / "ckpt"))

    try:
        np.testing.assert_allclose(
            got["losses"], want["losses"], rtol=LOSS_RTOL,
            err_msg=(f"{name}: loss trajectory drifted from GOLDEN.json - "
                     "either a regression or an intentional change that "
                     "must be re-pinned with "
                     "`python -m tools.golden_run --write`"))
        assert abs(got["miou"] - want["miou"]) <= MIOU_ATOL, \
            (name, got["miou"], want["miou"])
    except AssertionError:
        # Goldens pin CPU XLA instruction selection; on a different
        # jax/XLA version drift is expected and is not a repo regression
        # (ADVICE r3) — distinguish it from a real failure. But a version
        # mismatch must not mask GROSS regressions (ADVICE r4): version
        # drift moves losses at the 1e-3 level, a lost gradient term or
        # broken augmentation moves them by orders — hold a loose bound
        # before xfailing.
        import jax
        pinned = golden.get("jax_version")
        if pinned is not None and pinned != jax.__version__:
            np.testing.assert_allclose(
                got["losses"], want["losses"], rtol=0.15,
                err_msg=(f"{name}: losses diverge >15% from GOLDEN.json - "
                         "too large for jax-version drift; this is a real "
                         "regression"))
            assert abs(got["miou"] - want["miou"]) <= 0.1, \
                (name, got["miou"], want["miou"],
                 "mIoU off by >0.1 - too large for jax-version drift")
            pytest.xfail(f"GOLDEN.json pinned on jax {pinned}, running "
                         f"{jax.__version__} - regenerate with "
                         "`python -m tools.golden_run --write` to re-pin")
        raise
