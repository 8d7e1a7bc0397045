"""DABNet (Li & Kim 2019, arXiv 1907.11357) — NHWC, TPU-native.

Reference counterpart: ``model/DABNet.py`` [R] (Conv, BNPReLU, DABModule,
DownSamplingBlock, InputInjection). ~0.76M params, paper 70.1 mIoU.

DAB module: BN+PReLU -> 3x3 reduce to ch/2 -> dual depth-wise asymmetric
branches (3x1+1x3, plain || dilated) -> sum -> 1x1 expand -> residual.
Stages: 3 modules d=2 at 1/4; 6 modules d=4,4,8,8,16,16 at 1/8; raw-input
injections at 1/2, 1/4, 1/8.
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import nn
from ..ops import pooling as P
from ..ops import resize as R
from .blocks import BNAct, ConvBNAct, InputInjection
from .registry import register

BN_EPS = 1e-3


class DABModule(nn.Module):
    def __init__(self, ch: int, dilation: int = 2):
        half = ch // 2
        d = dilation
        self.pre = BNAct(ch, act="prelu", bn_eps=BN_EPS)
        self.reduce = ConvBNAct(ch, half, 3, act="prelu", bn_eps=BN_EPS)
        # plain depthwise asymmetric pair
        self.a1 = nn.Conv(half, half, (3, 1), padding=(1, 0), groups=half,
                          bias=False)
        self.a2 = nn.Conv(half, half, (1, 3), padding=(0, 1), groups=half,
                          bias=False)
        self.a_post = BNAct(half, act="prelu", bn_eps=BN_EPS)
        # dilated depthwise asymmetric pair
        self.b1 = nn.Conv(half, half, (3, 1), padding=(d, 0),
                          dilation=(d, 1), groups=half, bias=False)
        self.b2 = nn.Conv(half, half, (1, 3), padding=(0, d),
                          dilation=(1, d), groups=half, bias=False)
        self.b_post = BNAct(half, act="prelu", bn_eps=BN_EPS)
        self.expand = nn.Conv(half, ch, 1, bias=False)

    def __call__(self, scope, x):
        y = scope("pre", self.pre, x)
        y = scope("reduce", self.reduce, y)
        a = scope("a2", self.a2, scope("a1", self.a1, y))
        a = scope("a_post", self.a_post, a)
        b = scope("b2", self.b2, scope("b1", self.b1, y))
        b = scope("b_post", self.b_post, b)
        y = scope("expand", self.expand, a + b)
        return x + y


class DownSamplingBlock(nn.Module):
    """conv s2 (out-in) || maxpool concat (ENet style) [R]."""

    def __init__(self, in_ch: int, out_ch: int):
        self.concat_pool = out_ch > in_ch
        conv_out = out_ch - in_ch if self.concat_pool else out_ch
        self.conv = nn.Conv(in_ch, conv_out, 3, stride=2, padding=1,
                            bias=True)
        self.post = BNAct(out_ch, act="prelu", bn_eps=BN_EPS)

    def __call__(self, scope, x):
        y = scope("conv", self.conv, x)
        if self.concat_pool:
            y = jnp.concatenate([y, P.max_pool2d(x, 2, 2)], axis=-1)
        return scope("post", self.post, y)


@register("dabnet")
class DABNet(nn.Module):
    LOGITS_TAIL = "resize"
    def __init__(self, classes: int = 19, in_ch: int = 3):
        self.stem = nn.Sequential(
            ConvBNAct(in_ch, 32, 3, stride=2, act="prelu", bn_eps=BN_EPS),
            ConvBNAct(32, 32, 3, act="prelu", bn_eps=BN_EPS),
            ConvBNAct(32, 32, 3, act="prelu", bn_eps=BN_EPS))
        self.inj1 = InputInjection(1)
        self.inj2 = InputInjection(2)
        self.inj3 = InputInjection(3)
        self.b1 = BNAct(32 + in_ch, act="prelu", bn_eps=BN_EPS)

        self.down1 = DownSamplingBlock(32 + in_ch, 64)
        self.block1 = nn.Sequential(*[DABModule(64, 2) for _ in range(3)])
        self.b2 = BNAct(128 + in_ch, act="prelu", bn_eps=BN_EPS)

        self.down2 = DownSamplingBlock(128 + in_ch, 128)
        self.block2 = nn.Sequential(*[DABModule(128, d)
                                      for d in (4, 4, 8, 8, 16, 16)])
        self.b3 = BNAct(256 + in_ch, act="prelu", bn_eps=BN_EPS)
        self.head = nn.Conv(256 + in_ch, classes, 1, bias=False)

    def __call__(self, scope, x):
        h, w = x.shape[1:3]
        y = scope("stem", self.stem, x)                       # 1/2, 32
        i1 = scope("inj1", self.inj1, x)
        i2 = scope("inj2", self.inj2, x)
        i3 = scope("inj3", self.inj3, x)
        y = scope("b1", self.b1, jnp.concatenate([y, i1], -1))

        d1 = scope("down1", self.down1, y)                    # 1/4, 64
        y = scope("block1", self.block1, d1)
        y = scope("b2", self.b2, jnp.concatenate([y, d1, i2], -1))

        d2 = scope("down2", self.down2, y)                    # 1/8, 128
        y = scope("block2", self.block2, d2)
        y = scope("b3", self.b3, jnp.concatenate([y, d2, i3], -1))
        y = scope("head", self.head, y)
        return R.resize_bilinear(y.astype(jnp.float32), (h, w)) \
            .astype(y.dtype)
