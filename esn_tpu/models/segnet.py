"""SegNet (Badrinarayanan et al. 2015, arXiv 1511.00561) — NHWC.

Reference counterpart: ``model/SegNet.py`` [R]. VGG16 13-conv encoder with
five 2x2 index-saving max pools; exactly mirrored decoder driven by the
framework's scatter-free max-unpool (esn_tpu/ops/pooling.py). ~29.5M params.
"""
from __future__ import annotations

from .. import nn
from ..ops import pooling as P
from .blocks import ConvBNAct
from .registry import register

VGG_CFG = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


@register("segnet")
class SegNet(nn.Module):
    def __init__(self, classes: int = 19, in_ch: int = 3):
        self.classes = classes
        self.enc_stages = []
        cin = in_ch
        for ch, n in VGG_CFG:
            self.enc_stages.append(nn.Sequential(
                *[ConvBNAct(cin if i == 0 else ch, ch, 3, act="relu")
                  for i in range(n)]))
            cin = ch
        self.dec_stages = []
        chs = [c for c, _ in VGG_CFG]           # 64 128 256 512 512
        for stage in range(4, -1, -1):
            ch = chs[stage]
            out = chs[stage - 1] if stage > 0 else chs[0]
            n = VGG_CFG[stage][1]
            convs = [ConvBNAct(ch, ch, 3, act="relu") for _ in range(n - 1)]
            convs.append(ConvBNAct(ch, out, 3, act="relu") if stage > 0
                         else ConvBNAct(ch, ch, 3, act="relu"))
            self.dec_stages.append(nn.Sequential(*convs))
        self.head = nn.Conv(chs[0], classes, 3, padding=1, bias=True)

    def __call__(self, scope, x):
        indices = []
        for i, stage in enumerate(self.enc_stages):
            x = scope(f"enc{i}", stage, x)
            x, idx = P.max_pool2d_with_indices_2x2(x)
            indices.append(idx)
        for j, stage in enumerate(self.dec_stages):
            x = P.max_unpool2d_2x2(x, indices[4 - j])
            x = scope(f"dec{j}", stage, x)
        return scope("head", self.head, x)
