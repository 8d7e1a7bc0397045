"""Weight initializers.

Matches the reference's init scheme (reference: ``utils/utils.py :: init_weight``
[R] — Kaiming-normal fan-out for convs, BN gamma=1/beta=0) plus torch-style
fan-in uniform defaults used implicitly by layers the reference leaves at
torch defaults.

All initializers have signature ``f(rng, shape, dtype) -> array``. Conv kernel
shapes are HWIO (height, width, in_per_group, out).
"""
import numpy as np
import jax
import jax.numpy as jnp


def zeros(rng, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(rng, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


def constant(value):
    def init(rng, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)
    return init


def _conv_fans(shape):
    # HWIO: receptive field * in channels (per group) / * out channels
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    fan_in = receptive * shape[-2]
    fan_out = receptive * shape[-1]
    return fan_in, fan_out


def kaiming_normal(mode: str = "fan_out", nonlinearity_gain: float = np.sqrt(2.0)):
    """He-normal. gain sqrt(2) for ReLU-family (reference uses this for convs)."""
    def init(rng, shape, dtype=jnp.float32):
        fan_in, fan_out = _conv_fans(shape)
        fan = fan_out if mode == "fan_out" else fan_in
        std = nonlinearity_gain / np.sqrt(max(fan, 1))
        return std * jax.random.normal(rng, shape, dtype)
    return init


def torch_conv_default(rng, shape, dtype=jnp.float32):
    """torch.nn.Conv2d default: U(-b, b), b = 1/sqrt(fan_in)."""
    fan_in, _ = _conv_fans(shape)
    bound = 1.0 / np.sqrt(max(fan_in, 1))
    return jax.random.uniform(rng, shape, dtype, -bound, bound)


def uniform_bound(bound: float):
    def init(rng, shape, dtype=jnp.float32):
        return jax.random.uniform(rng, shape, dtype, -bound, bound)
    return init


def bias_for_fan_in(fan_in: int):
    """torch default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / np.sqrt(max(fan_in, 1))
    return uniform_bound(bound)
