"""model.predict (fused subpixel prediction head) must equal
argmax(model logits) EXACTLY for every model — it is the eval/predict/bench
path (train/step.py make_eval_step)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esn_tpu import nn
from esn_tpu.models import build_model
from esn_tpu.ops import argmax_lastdim

FUSED = ["erfnet", "esnet", "linknet", "sqnet", "fssnet", "enet", "espnet"]
DEFAULT = ["fastscnn", "segnet", "unet", "espnet_c"]


@pytest.mark.parametrize("name", FUSED + DEFAULT)
def test_predict_matches_argmax_of_logits(name):
    m = build_model(name, 19)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 96, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    logits = nn.apply(m, v, x)
    ref = argmax_lastdim(logits, tail=m.LOGITS_TAIL)
    got = nn.apply(m, v, x, method="predict")
    assert got.shape == ref.shape and got.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
