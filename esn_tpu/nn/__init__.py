from .core import Module, Scope, Sequential, ScanChain, Fn, init, apply
from .layers import (Conv, ConvTranspose, BatchNorm, PReLU, Dropout,
                     SpatialDropout, Dense, relu, relu6, sigmoid)
from . import initializers

__all__ = [
    "Module", "Scope", "Sequential", "ScanChain", "Fn", "init", "apply",
    "Conv", "ConvTranspose", "BatchNorm", "PReLU", "Dropout",
    "SpatialDropout", "Dense", "relu", "relu6", "sigmoid", "initializers",
]
