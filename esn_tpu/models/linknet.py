"""LinkNet (Chaurasia & Culurciello 2017, arXiv 1707.03718) — NHWC.

Reference counterpart: ``model/LinkNet.py`` [R] (BasicBlock, Encoder,
Decoder). ResNet18-style encoder, 1x1 -> deconv -> 1x1 decoders with
additive skips. ~11.5M params.
"""
from __future__ import annotations

from .. import nn
from ..ops import pooling as P
from .blocks import ConvBNAct, subpixel_predict_tail
from .registry import register


class BasicBlock(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, stride: int = 1):
        self.c1 = ConvBNAct(in_ch, out_ch, 3, stride=stride, act="relu")
        self.c2 = ConvBNAct(out_ch, out_ch, 3, act="none")
        self.down = ConvBNAct(in_ch, out_ch, 1, stride=stride, act="none") \
            if (stride != 1 or in_ch != out_ch) else None

    def __call__(self, scope, x):
        y = scope("c1", self.c1, x)
        y = scope("c2", self.c2, y)
        skip = scope("down", self.down, x) if self.down is not None else x
        return nn.relu(y + skip)


class DecoderBlock(nn.Module):
    """1x1 reduce (in/4) -> 3x3 s2 deconv -> 1x1 expand."""

    def __init__(self, in_ch: int, out_ch: int, upsample: bool = True):
        mid = in_ch // 4
        self.reduce = ConvBNAct(in_ch, mid, 1, act="relu")
        if upsample:
            self.up = nn.ConvTranspose(mid, mid, 3, stride=2, padding=1,
                                       output_padding=1, bias=False)
        else:
            self.up = nn.Conv(mid, mid, 3, padding=1, bias=False)
        self.up_bn = nn.BatchNorm(mid)
        self.expand = ConvBNAct(mid, out_ch, 1, act="relu")

    def __call__(self, scope, x):
        y = scope("reduce", self.reduce, x)
        y = nn.relu(scope("up_bn", self.up_bn, scope("up", self.up, y)))
        return scope("expand", self.expand, y)


@register("linknet")
class LinkNet(nn.Module):
    def __init__(self, classes: int = 19, in_ch: int = 3):
        self.stem = ConvBNAct(in_ch, 64, 7, stride=2, padding=3, act="relu")
        chs = (64, 128, 256, 512)
        self.enc = []
        cin = 64
        for i, c in enumerate(chs):
            stride = 1 if i == 0 else 2
            self.enc.append(nn.Sequential(BasicBlock(cin, c, stride),
                                          BasicBlock(c, c)))
            cin = c
        self.dec = [DecoderBlock(chs[3], chs[2]),
                    DecoderBlock(chs[2], chs[1]),
                    DecoderBlock(chs[1], chs[0]),
                    DecoderBlock(chs[0], chs[0], upsample=False)]
        self.final_up = nn.ConvTranspose(64, 32, 3, stride=2, padding=1,
                                         output_padding=1, bias=False)
        self.final_bn = nn.BatchNorm(32)
        self.final_conv = ConvBNAct(32, 32, 3, act="relu")
        self.head = nn.ConvTranspose(32, classes, 2, stride=2, bias=True)

    def features(self, scope, x):
        y = scope("stem", self.stem, x)
        y = P.max_pool2d(y, 3, 2, 1)
        skips = []
        for i, stage in enumerate(self.enc):
            y = scope(f"enc{i}", stage, y)
            skips.append(y)
        y = scope("dec0", self.dec[0], y) + skips[2]
        y = scope("dec1", self.dec[1], y) + skips[1]
        y = scope("dec2", self.dec[2], y) + skips[0]
        y = scope("dec3", self.dec[3], y)
        y = nn.relu(scope("final_bn", self.final_bn,
                          scope("final_up", self.final_up, y)))
        y = scope("final_conv", self.final_conv, y)
        return y

    def __call__(self, scope, x):
        return scope("head", self.head,
                     self.features(scope, x))

    def predict(self, scope, x):
        """Fused prediction head — see blocks.subpixel_predict_tail."""
        return subpixel_predict_tail(self.head,
                                     scope.child("head"),
                                     self.features(scope, x))
