"""Model zoo tests: shape contract, param-count parity vs paper, gradient
flow, train-mode stats — ONE init per model (this box has a single CPU core,
so repeated unjitted inits dominate test time).

Param targets are paper-reported (BASELINE.md); tolerance is generous since
several papers round aggressively and variants differ.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esn_tpu.models import build_model, available_models
from esn_tpu.utils.params import count_params

# name -> (paper params in M or None, rel tolerance)
PARAM_TARGETS = {
    "enet": (0.37, 0.15),
    "fastscnn": (1.11, 0.15),
    "contextnet": (0.85, 0.20),
    "erfnet": (2.06, 0.10),
    "edanet": (0.68, 0.10),
    "esnet": (1.66, 0.10),
    "linknet": (11.5, 0.10),
    "segnet": (29.5, 0.10),
    "fssnet": (0.20, 0.25),
    # sqnet: paper params poorly specified; regression-pin our reconstruction
    "sqnet": (6.40, 0.10),
    "unet": (31.0, 0.10),
    "cgnet": (0.50, 0.10),
    "dabnet": (0.76, 0.10),
    "lednet": (0.94, 0.20),
    "fpenet": (0.38, 0.15),
    "espnet": (0.36, 0.10),
    "espnet_c": (0.35, 0.10),
    "espnetv2": (0.80, 0.25),
}

H, W, CLASSES = 64, 128, 19


@pytest.mark.parametrize("name", sorted(set(available_models())))
def test_model_contract(name):
    """init -> param parity -> train forward+grad -> eval forward, one init."""
    model = build_model(name, CLASSES)
    x = jnp.ones((1, H, W, 3), jnp.float32) * 0.1
    variables = model.init(jax.random.PRNGKey(0), x)

    # --- param parity
    if name in PARAM_TARGETS:
        target_m, tol = PARAM_TARGETS[name]
        got_m = count_params(variables) / 1e6
        assert got_m == pytest.approx(target_m, rel=tol), \
            f"{name}: {got_m:.3f}M vs paper {target_m}M"

    # --- eval forward: full-resolution logits
    y = model.apply(variables, x)
    assert y.shape == (1, H, W, CLASSES), f"{name}: {y.shape}"
    assert np.all(np.isfinite(np.asarray(y))), name

    # --- train forward + grad: finite, mostly-nonzero, stats tree stable
    def loss_fn(params):
        out, new_vars = model.apply(
            {"params": params, "stats": variables["stats"]}, x,
            train=True, mutable=True, rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.mean(out.astype(jnp.float32) ** 2), new_vars["stats"]

    (loss, new_stats), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss)), name
    assert jax.tree_util.tree_structure(new_stats) == \
        jax.tree_util.tree_structure(variables["stats"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves), name
    nonzero = sum(bool(np.any(np.asarray(g) != 0)) for g in leaves)
    assert nonzero > len(leaves) * 0.5, f"{name}: too many dead grads"


def test_all_13_contractual_models_present():
    """BASELINE.json north star: the 13-model contractual minimum."""
    required = ["enet", "erfnet", "espnet", "espnetv2", "cgnet", "dabnet",
                "edanet", "fastscnn", "contextnet", "lednet", "linknet",
                "segnet", "fpenet", "sqnet"]
    have = set(available_models())
    missing = [m for m in required if m not in have]
    assert not missing, f"missing contractual models: {missing}"


def test_enet_jit_forward():
    model = build_model("enet", 11)
    x = jnp.zeros((1, 96, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    fwd = jax.jit(lambda v, x: model.apply(v, x))
    y = fwd(variables, x)
    assert y.shape == (1, 96, 96, 11)
    assert np.all(np.isfinite(np.asarray(y)))


def test_camvid_shape_variant():
    """11-class, non-square input works across a representative subset."""
    for name in ("enet", "fastscnn", "cgnet"):
        model = build_model(name, 11)
        x = jnp.zeros((1, 96, 64, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(variables, x)
        assert y.shape == (1, 96, 64, 11), name
