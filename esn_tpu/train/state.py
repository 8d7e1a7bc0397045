"""TrainState: one pytree carries everything the jitted step needs.

The reference has no such object — ``train.py`` keeps model/optimizer/epoch
as loose Python state [R]. Here (params, stats, opt_state, step) is a single
donated pytree, so the optimizer update runs in-place in HBM.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    stats: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation) -> "TrainState":
        return cls(params=variables["params"], stats=variables["stats"],
                   opt_state=tx.init(variables["params"]),
                   step=jnp.zeros([], jnp.int32))

    @property
    def variables(self):
        return {"params": self.params, "stats": self.stats}
