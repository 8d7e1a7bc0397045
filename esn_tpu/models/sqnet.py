"""SQNet — "Speeding up Semantic Segmentation for Autonomous Driving"
(Treml et al., NIPS-W 2016) — NHWC.

Reference counterpart: ``model/SQNet.py`` [R] (Fire encoder, parallel dilated
convs, bypass-refinement decoder). ~16M params, 59.8 mIoU. The paper gives
the topology at block granularity; this is a faithful reconstruction at that
granularity (SqueezeNet-v1.1 encoder, ELU activations approximated by ReLU,
parallel dilated context head d=1,2,4,8, three transposed-conv refinement
stages with encoder bypasses).
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import nn
from ..ops import pooling as P
from .blocks import ConvBNAct, subpixel_predict_tail
from .registry import register


class Fire(nn.Module):
    """squeeze 1x1 -> expand 1x1 || 3x3, concat (SqueezeNet fire [R])."""

    def __init__(self, in_ch: int, squeeze: int, expand: int):
        self.squeeze = nn.Conv(in_ch, squeeze, 1, bias=True)
        self.e1 = nn.Conv(squeeze, expand, 1, bias=True)
        self.e3 = nn.Conv(squeeze, expand, 3, padding=1, bias=True)

    def __call__(self, scope, x):
        s = nn.relu(scope("squeeze", self.squeeze, x))
        return jnp.concatenate([nn.relu(scope("e1", self.e1, s)),
                                nn.relu(scope("e3", self.e3, s))], axis=-1)


class ParallelDilatedConv(nn.Module):
    """Four parallel 3x3 convs d=1,2,4,8, summed (context head [R])."""

    def __init__(self, in_ch: int, out_ch: int):
        self.convs = [nn.Conv(in_ch, out_ch, 3, padding=d, dilation=d,
                              bias=True) for d in (1, 2, 4, 8)]

    def __call__(self, scope, x):
        total = None
        for i, c in enumerate(self.convs):
            y = nn.relu(scope(f"d{i}", c, x))
            total = y if total is None else total + y
        return total


class BypassRefine(nn.Module):
    """Deconv the deep path x2, refine the skip, concat, 3x3 fuse."""

    def __init__(self, deep_ch: int, skip_ch: int, out_ch: int):
        self.up = nn.ConvTranspose(deep_ch, out_ch, 2, stride=2, bias=True)
        self.refine = nn.Conv(skip_ch, out_ch, 3, padding=1, bias=True)
        self.fuse = nn.Conv(2 * out_ch, out_ch, 3, padding=1, bias=True)

    def __call__(self, scope, deep, skip):
        d = nn.relu(scope("up", self.up, deep))
        s = nn.relu(scope("refine", self.refine, skip))
        return nn.relu(scope("fuse", self.fuse,
                             jnp.concatenate([d, s], axis=-1)))


@register("sqnet")
class SQNet(nn.Module):
    def __init__(self, classes: int = 19, in_ch: int = 3):
        self.conv1 = nn.Conv(in_ch, 96, 3, stride=2, padding=1, bias=True)
        self.f1 = Fire(96, 16, 64)     # -> 128  (1/4 after pool)
        self.f2 = Fire(128, 16, 64)    # -> 128
        self.f3 = Fire(128, 32, 128)   # -> 256  (1/8 after pool)
        self.f4 = Fire(256, 32, 128)   # -> 256
        self.f5 = Fire(256, 48, 192)   # -> 384  (1/16 after pool)
        self.f6 = Fire(384, 48, 192)   # -> 384
        self.f7 = Fire(384, 64, 256)   # -> 512
        self.f8 = Fire(512, 64, 256)   # -> 512
        self.context = ParallelDilatedConv(512, 256)
        self.r3 = BypassRefine(256, 256, 128)   # 1/16 -> 1/8, skip f4 out
        self.r2 = BypassRefine(128, 128, 64)    # 1/8 -> 1/4, skip f2 out
        self.r1 = BypassRefine(64, 96, 32)      # 1/4 -> 1/2, skip conv1 out
        self.head = nn.ConvTranspose(32, classes, 2, stride=2, bias=True)

    def features(self, scope, x):
        c1 = nn.relu(scope("conv1", self.conv1, x))       # 1/2, 96
        y = P.max_pool2d(c1, 2, 2)                        # 1/4
        y = scope("f1", self.f1, y)
        s4 = scope("f2", self.f2, y)                      # 1/4, 128
        y = P.max_pool2d(s4, 2, 2)                        # 1/8
        y = scope("f3", self.f3, y)
        s8 = scope("f4", self.f4, y)                      # 1/8, 256
        y = P.max_pool2d(s8, 2, 2)                        # 1/16
        y = scope("f5", self.f5, y)
        y = scope("f6", self.f6, y)
        y = scope("f7", self.f7, y)
        y = scope("f8", self.f8, y)                       # 1/16, 512
        y = scope("context", self.context, y)             # 1/16, 256
        y = scope("r3", self.r3, y, s8)                   # 1/8, 128
        y = scope("r2", self.r2, y, s4)                   # 1/4, 64
        y = scope("r1", self.r1, y, c1)                   # 1/2, 32
        return y

    def __call__(self, scope, x):
        return scope("head", self.head,
                     self.features(scope, x))

    def predict(self, scope, x):
        """Fused prediction head — see blocks.subpixel_predict_tail."""
        return subpixel_predict_tail(self.head,
                                     scope.child("head"),
                                     self.features(scope, x))
