"""Parameter utilities (reference: utils/utils.py :: netParams [R])."""
from __future__ import annotations

import jax
import numpy as np


def count_params(variables_or_params) -> int:
    tree = variables_or_params.get("params", variables_or_params) \
        if isinstance(variables_or_params, dict) else variables_or_params
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree)))


def net_params(variables) -> int:
    """Alias matching the reference's netParams() name."""
    return count_params(variables)
