"""Optimizer factory.

Reference: ``utils/optim/*.py`` [R] vendors RAdam / Ranger (RAdam+Lookahead) /
AdamW as torch optimizers, selected by ``--optim {sgd,adam,radam,ranger}``
with SGD(momentum=0.9, wd=1e-4) as the classic baseline. Here they are optax
transformation chains; Lookahead is a self-contained GradientTransformation
(flat state, no special param wrapper) so the TrainState stays uniform.

Weight decay follows torch semantics (L2 added to the gradient before the
adaptive transform) except adamw, which is decoupled.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax

ScheduleOrFloat = Union[float, Callable]


class LookaheadState(NamedTuple):
    inner: Any
    slow_params: Any
    count: jnp.ndarray


def lookahead(inner: optax.GradientTransformation, sync_period: int = 6,
              slow_step_size: float = 0.5) -> optax.GradientTransformation:
    """Lookahead wrapper (Zhang et al. 2019): every ``sync_period`` steps the
    slow weights absorb the fast weights and the fast weights reset."""

    def init_fn(params):
        return LookaheadState(inner=inner.init(params), slow_params=params,
                              count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("lookahead requires params")
        inner_updates, inner_state = inner.update(updates, state.inner, params)
        count = state.count + 1
        sync = (count % sync_period) == 0
        fast = jax.tree_util.tree_map(lambda p, u: p + u, params, inner_updates)
        slow = jax.tree_util.tree_map(
            lambda s, f: jnp.where(sync, s + slow_step_size * (f - s), s),
            state.slow_params, fast)
        final = jax.tree_util.tree_map(
            lambda s, f: jnp.where(sync, s, f), slow, fast)
        out_updates = jax.tree_util.tree_map(lambda f, p: f - p, final, params)
        return out_updates, LookaheadState(inner_state, slow, count)

    return optax.GradientTransformation(init_fn, update_fn)


def _with_l2(wd: float, *transforms) -> optax.GradientTransformation:
    chain = []
    if wd and wd > 0:
        chain.append(optax.add_decayed_weights(wd))
    chain.extend(transforms)
    return optax.chain(*chain)


def build_optimizer(name: str, learning_rate: ScheduleOrFloat, *,
                    weight_decay: float = 1e-4, momentum: float = 0.9,
                    b1: float = 0.9, b2: float = 0.999,
                    eps: float = 1e-8) -> optax.GradientTransformation:
    """Mirrors the reference's --optim flag surface [R: train.py]."""
    name = name.lower()
    lr = optax.scale_by_learning_rate(learning_rate)
    if name == "sgd":
        return _with_l2(weight_decay,
                        optax.trace(decay=momentum, nesterov=False), lr)
    if name == "adam":
        return _with_l2(weight_decay, optax.scale_by_adam(b1, b2, eps), lr)
    if name == "adamw":
        return optax.chain(optax.scale_by_adam(b1, b2, eps),
                           optax.add_decayed_weights(weight_decay), lr)
    if name == "radam":
        return _with_l2(weight_decay, optax.scale_by_radam(b1, b2, eps), lr)
    if name == "ranger":
        inner = _with_l2(weight_decay, optax.scale_by_radam(b1, b2, eps), lr)
        return lookahead(inner, sync_period=6, slow_step_size=0.5)
    raise KeyError(f"unknown optimizer {name!r}; "
                   "options: sgd adam adamw radam ranger")
