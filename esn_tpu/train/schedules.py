"""Learning-rate schedules.

Reference: ``utils/scheduler/lr_scheduler.py`` [R] — 'poly'
(``(1 - t/T)^0.9``) and 'warmpoly' (``WarmupPolyLR``: linear warmup with
factor 1/3 over ~500 iters, then poly), both stepped **per iteration** with
``T = max_epochs * iters_per_epoch``. Here they are plain optax-style
``step -> lr`` callables consumed inside the jitted train step.
"""
from __future__ import annotations

import jax.numpy as jnp


def poly_schedule(base_lr: float, total_steps: int, power: float = 0.9):
    total = max(total_steps, 1)

    def schedule(step):
        t = jnp.clip(step / total, 0.0, 1.0)
        return base_lr * (1.0 - t) ** power

    return schedule


def warmup_poly_schedule(base_lr: float, total_steps: int, power: float = 0.9,
                         warmup_steps: int = 500,
                         warmup_factor: float = 1.0 / 3.0):
    total = max(total_steps, 1)
    warmup_steps = max(int(warmup_steps), 0)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_steps > 0:
            alpha = jnp.clip(step / warmup_steps, 0.0, 1.0)
            warm = base_lr * (warmup_factor * (1.0 - alpha) + alpha)
        else:
            warm = base_lr
        t = jnp.clip(step / total, 0.0, 1.0)
        poly = base_lr * (1.0 - t) ** power
        return jnp.where(step < warmup_steps, warm, poly)

    return schedule


def constant_schedule(base_lr: float):
    def schedule(step):
        return jnp.asarray(base_lr, jnp.float32)
    return schedule


def build_schedule(name: str, base_lr: float, total_steps: int, *,
                   power: float = 0.9, warmup_steps: int = 500,
                   warmup_factor: float = 1.0 / 3.0):
    """Mirrors the reference's --lr_schedule {poly, warmpoly} flags [R]."""
    if name == "poly":
        return poly_schedule(base_lr, total_steps, power)
    if name in ("warmpoly", "warmup_poly"):
        return warmup_poly_schedule(base_lr, total_steps, power,
                                    warmup_steps, warmup_factor)
    if name in ("constant", "fixed"):
        return constant_schedule(base_lr)
    raise KeyError(f"unknown lr schedule {name!r}")
