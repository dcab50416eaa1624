"""VoVNet, TPU-native. Behavioral reference: pytorchcv ``models/vovnet.py``
(VoVUnit:15, VoVInitBlock:61, VoVNet:111, get_vovnet:189). One-shot
aggregation: chained 3x3 branches concatenated with the input."""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import (Sequential, SequentialConcurrent, conv1x1_block,
                  conv3x3_block, global_avg_pool2d, max_pool2d)
from ..nn.base import dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["VoVNet", "get_vovnet"]


class VoVUnit(nn.Module):
    """One-shot aggregation unit (reference vovnet.py:15)."""

    out_channels: int = 0
    branch_channels: int = 0
    num_branches: int = 5
    resize: bool = False
    use_residual: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.resize:
            x = max_pool2d(3, 2, ceil_mode=True)(x)
        identity = x
        branches = [conv3x3_block(out_channels=self.branch_channels,
                                  name=f"branch{i + 1}", parent=None)
                    for i in range(self.num_branches)]
        x = SequentialConcurrent(layers=tuple(branches),
                                 name="branches")(x, train=train)
        x = conv1x1_block(out_channels=self.out_channels,
                          name="concat_conv")(x, train=train)
        if self.use_residual:
            x = x + identity
        return x


class VoVInitBlock(nn.Module):
    """3-conv stem ending stride 2 (reference vovnet.py:61)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = self.out_channels // 2
        x = conv3x3_block(out_channels=mid_channels, stride=2,
                          name="conv1")(x, train=train)
        x = conv3x3_block(out_channels=mid_channels, name="conv2")(
            x, train=train)
        x = conv3x3_block(out_channels=self.out_channels, stride=2,
                          name="conv3")(x, train=train)
        return x


def VoVNet(channels, branch_channels, num_branches: int,
           in_channels: int = 3, in_size: Tuple[int, int] = (224, 224),
           num_classes: int = 1000) -> ImageClassifier:
    """VoVNet (reference vovnet.py:111)."""
    layers = [VoVInitBlock(out_channels=128, name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            units.append(VoVUnit(
                out_channels=out_channels,
                branch_channels=branch_channels[i][j],
                num_branches=num_branches,
                resize=(j == 0) and (i != 0),
                use_residual=(j != 0), name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_vovnet(blocks: int, slim: bool = False, **kwargs):
    """Config expander (reference vovnet.py:189)."""
    layer_table = {27: [1, 1, 1, 1], 39: [1, 1, 2, 2], 57: [1, 1, 4, 3]}
    if blocks not in layer_table:
        raise ValueError(f"Unsupported VoVNet blocks: {blocks}")
    layers = layer_table[blocks]
    num_branches = 5
    channels_per_layers = [256, 512, 768, 1024]
    branch_channels_per_layers = [128, 160, 192, 224]
    if slim:
        channels_per_layers = [ci // 2 for ci in channels_per_layers]
        branch_channels_per_layers = [ci // 2 for ci in
                                      branch_channels_per_layers]
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    branch_channels = [[ci] * li for ci, li in
                       zip(branch_channels_per_layers, layers)]
    return VoVNet(channels=channels, branch_channels=branch_channels,
                  num_branches=num_branches, **kwargs)


@register_model("vovnet27s")
def vovnet27s(**kwargs):
    return get_vovnet(blocks=27, slim=True, **kwargs)


@register_model("vovnet39")
def vovnet39(**kwargs):
    return get_vovnet(blocks=39, **kwargs)


@register_model("vovnet57")
def vovnet57(**kwargs):
    return get_vovnet(blocks=57, **kwargs)
