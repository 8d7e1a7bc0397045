"""UNet (Ronneberger et al. 2015) — NHWC.

Reference counterpart: ``model/UNet.py`` [R] (DoubleConv, Down, Up) —
same-padding variant with concat skips and bilinear or transposed-conv
upsampling.
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import nn
from ..ops import pooling as P
from ..ops import resize as R
from .blocks import ConvBNAct
from .registry import register


class DoubleConv(nn.Module):
    def __init__(self, in_ch: int, out_ch: int):
        self.c1 = ConvBNAct(in_ch, out_ch, 3, act="relu")
        self.c2 = ConvBNAct(out_ch, out_ch, 3, act="relu")

    def __call__(self, scope, x):
        return scope("c2", self.c2, scope("c1", self.c1, x))


class Up(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, bilinear: bool = True):
        self.bilinear = bilinear
        if not bilinear:
            self.up = nn.ConvTranspose(in_ch, in_ch // 2, 2, stride=2,
                                       bias=True)
            self.conv = DoubleConv(in_ch, out_ch)
        else:
            self.up = None
            self.conv = DoubleConv(in_ch + in_ch // 2, out_ch)

    def __call__(self, scope, x, skip):
        if self.bilinear:
            x = R.resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))
        else:
            x = scope("up", self.up, x)
        x = jnp.concatenate([skip, x], axis=-1)
        return scope("conv", self.conv, x)


@register("unet")
class UNet(nn.Module):
    def __init__(self, classes: int = 19, in_ch: int = 3,
                 base: int = 64, bilinear: bool = False):
        b = base
        self.inc = DoubleConv(in_ch, b)
        self.down = [DoubleConv(b, 2 * b), DoubleConv(2 * b, 4 * b),
                     DoubleConv(4 * b, 8 * b), DoubleConv(8 * b, 16 * b)]
        chs = [16 * b, 8 * b, 4 * b, 2 * b]
        outs = [8 * b, 4 * b, 2 * b, b]
        self.up = [Up(c, o, bilinear) for c, o in zip(chs, outs)]
        self.bilinear = bilinear
        self.head = nn.Conv(b, classes, 1, bias=True)

    def __call__(self, scope, x):
        s0 = scope("inc", self.inc, x)
        feats = [s0]
        y = s0
        for i, stage in enumerate(self.down):
            y = P.max_pool2d(y, 2, 2)
            y = scope(f"down{i}", stage, y)
            feats.append(y)
        for i, up in enumerate(self.up):
            y = up(scope.child(f"up{i}"), y, feats[3 - i])
        return scope("head", self.head, y)
