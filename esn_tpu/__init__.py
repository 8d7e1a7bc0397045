"""esn_tpu — TPU-native efficient semantic segmentation framework.

From-scratch JAX/XLA/Pallas rebuild of the capability surface of the
Efficient-Segmentation-Networks PyTorch zoo (see SURVEY.md). Public API:

    from esn_tpu.models import build_model, available_models
    from esn_tpu import nn                       # functional module calculus
    from esn_tpu.train.trainer import Trainer, TrainConfig
    from esn_tpu.train import losses, metrics, schedules, optimizers
    from esn_tpu.data import builders            # dataset/loader factories
    from esn_tpu.parallel import mesh, spatial   # DP + spatial sharding
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("ESN_TPU_PLATFORM"):
    # Force the JAX platform list (e.g. ESN_TPU_PLATFORM=cpu to drive the
    # CLIs without a TPU, or when the TPU relay is unreachable). Must be a
    # config update, not JAX_PLATFORMS: this environment's sitecustomize
    # registers the TPU plugin at interpreter start and pins
    # jax_platforms itself, overriding the env var.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["ESN_TPU_PLATFORM"])

from . import nn  # noqa: F401
from .models import available_models, build_model  # noqa: F401
