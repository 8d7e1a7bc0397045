"""FSSNet — Fast Semantic Segmentation Network (Zhang et al. 2019) — NHWC.

Reference counterpart: ``model/FSSNet.py`` [R] (InitialBlock,
FactorizedBlock, DilatedBlock, UpsamplingBlock). ENet-like stem, factorized
bottlenecks at 1/4, dilated bottlenecks at 1/8 (d = 2,5,9 x2), transposed-
conv decoder with additive encoder skips. ~0.2M params.
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import nn
from ..ops import pooling as P
from .blocks import ConvBNAct, subpixel_predict_tail
from .registry import register


class InitialBlock(nn.Module):
    def __init__(self, in_ch=3, out_ch=16):
        self.conv = nn.Conv(in_ch, out_ch - in_ch, 3, stride=2, padding=1,
                            bias=False)
        self.post = nn.Sequential(nn.BatchNorm(out_ch), nn.PReLU(out_ch))

    def __call__(self, scope, x):
        y = jnp.concatenate([scope("conv", self.conv, x),
                             P.max_pool2d(x, 2, 2)], axis=-1)
        return scope("post", self.post, y)


class DownBottleneck(nn.Module):
    """2x2/s2 conv bottleneck; skip = maxpool + channel pad."""

    def __init__(self, in_ch: int, out_ch: int, dropout: float = 0.1):
        mid = out_ch // 4
        self.in_ch, self.out_ch = in_ch, out_ch
        self.reduce = ConvBNAct(in_ch, mid, 2, stride=2, padding=0,
                                act="prelu")
        self.core = ConvBNAct(mid, mid, 3, act="prelu")
        self.expand = ConvBNAct(mid, out_ch, 1, act="none")
        self.drop = nn.SpatialDropout(dropout)
        self.act = nn.PReLU(out_ch)

    def __call__(self, scope, x):
        y = scope("reduce", self.reduce, x)
        y = scope("core", self.core, y)
        y = scope("expand", self.expand, y)
        y = scope("drop", self.drop, y)
        skip = P.max_pool2d(x, 2, 2)
        pad = self.out_ch - self.in_ch
        if pad > 0:
            skip = jnp.pad(skip, ((0, 0), (0, 0), (0, 0), (0, pad)))
        return scope("act", self.act, y + skip)


class FactorizedBlock(nn.Module):
    """1x1 -> (3x1, 1x3) -> 1x1 residual bottleneck, PReLU."""

    def __init__(self, ch: int, dropout: float = 0.1):
        mid = ch // 4
        self.reduce = ConvBNAct(ch, mid, 1, act="prelu")
        self.f1 = nn.Conv(mid, mid, (3, 1), padding=(1, 0), bias=False)
        self.f2 = nn.Conv(mid, mid, (1, 3), padding=(0, 1), bias=False)
        self.mid_post = nn.Sequential(nn.BatchNorm(mid), nn.PReLU(mid))
        self.expand = ConvBNAct(mid, ch, 1, act="none")
        self.drop = nn.SpatialDropout(dropout)
        self.act = nn.PReLU(ch)

    def __call__(self, scope, x):
        y = scope("reduce", self.reduce, x)
        y = scope("f2", self.f2, scope("f1", self.f1, y))
        y = scope("mid_post", self.mid_post, y)
        y = scope("expand", self.expand, y)
        y = scope("drop", self.drop, y)
        return scope("act", self.act, x + y)


class DilatedBlock(nn.Module):
    def __init__(self, ch: int, dilation: int, dropout: float = 0.1):
        mid = ch // 4
        self.reduce = ConvBNAct(ch, mid, 1, act="prelu")
        self.core = ConvBNAct(mid, mid, 3, dilation=dilation, act="prelu")
        self.expand = ConvBNAct(mid, ch, 1, act="none")
        self.drop = nn.SpatialDropout(dropout)
        self.act = nn.PReLU(ch)

    def __call__(self, scope, x):
        y = scope("reduce", self.reduce, x)
        y = scope("core", self.core, y)
        y = scope("expand", self.expand, y)
        y = scope("drop", self.drop, y)
        return scope("act", self.act, x + y)


class UpBottleneck(nn.Module):
    """1x1 -> 3x3/s2 deconv -> 1x1 bottleneck (decoder stage)."""

    def __init__(self, in_ch: int, out_ch: int, dropout: float = 0.1):
        mid = out_ch // 4
        self.reduce = ConvBNAct(in_ch, mid, 1, act="prelu")
        self.up = nn.ConvTranspose(mid, mid, 3, stride=2, padding=1,
                                   output_padding=1, bias=False)
        self.up_post = nn.Sequential(nn.BatchNorm(mid), nn.PReLU(mid))
        self.expand = ConvBNAct(mid, out_ch, 1, act="none")
        self.drop = nn.SpatialDropout(dropout)
        self.act = nn.PReLU(out_ch)

    def __call__(self, scope, x):
        y = scope("reduce", self.reduce, x)
        y = scope("up_post", self.up_post, scope("up", self.up, y))
        y = scope("expand", self.expand, y)
        y = scope("drop", self.drop, y)
        return scope("act", self.act, y)


@register("fssnet")
class FSSNet(nn.Module):
    def __init__(self, classes: int = 19, in_ch: int = 3):
        self.init_block = InitialBlock(in_ch, 16)
        self.down1 = DownBottleneck(16, 64, dropout=0.03)
        # repeated factorized/dilated stacks run as lax.scan bodies
        # (nn.ScanChain); the (2,5,9) dilation pattern repeats twice, so
        # it scans a 3-block Sequential pattern (dilations static inside)
        self.fac = nn.ScanChain(FactorizedBlock(64, 0.03), 4, eval_unroll=True)
        self.down2 = DownBottleneck(64, 128)
        self.dil = nn.ScanChain(nn.Sequential(DilatedBlock(128, 2),
                                              DilatedBlock(128, 5),
                                              DilatedBlock(128, 9)), 2,
                                eval_unroll=True)
        self.up2 = UpBottleneck(128, 64)
        self.dec2 = nn.ScanChain(FactorizedBlock(64), 2, eval_unroll=True)
        self.up1 = UpBottleneck(64, 16)
        self.dec1 = nn.ScanChain(FactorizedBlock(16), 2, eval_unroll=True)
        self.head = nn.ConvTranspose(16, classes, 3, stride=2, padding=1,
                                     output_padding=1, bias=True)

    def features(self, scope, x):
        y = scope("init", self.init_block, x)          # 1/2, 16
        e1 = scope("down1", self.down1, y)             # 1/4, 64
        e1 = scope("fac", self.fac, e1)
        e2 = scope("down2", self.down2, e1)            # 1/8, 128
        e2 = scope("dil", self.dil, e2)
        d2 = scope("up2", self.up2, e2) + e1           # 1/4, 64
        d2 = scope("dec2", self.dec2, d2)
        d1 = scope("up1", self.up1, d2) + y            # 1/2, 16
        d1 = scope("dec1", self.dec1, d1)
        return d1

    def __call__(self, scope, x):
        return scope("head", self.head,
                     self.features(scope, x))

    def predict(self, scope, x):
        """Fused prediction head — see blocks.subpixel_predict_tail."""
        return subpixel_predict_tail(self.head,
                                     scope.child("head"),
                                     self.features(scope, x))
