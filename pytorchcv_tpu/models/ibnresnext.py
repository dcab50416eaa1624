"""IBN-ResNeXt, TPU-native. Behavioral reference: pytorchcv
``models/ibnresnext.py`` (IBNResNeXtBottleneck:14, IBNResNeXtUnit:73,
IBNResNeXt:128, get_ibnresnext:219)."""

from __future__ import annotations

import math
from typing import Tuple

from flax import linen as nn

from ..nn import Sequential, conv1x1_block, conv3x3_block, global_avg_pool2d
from ..nn.base import dense_kernel_init
from .ibnresnet import ibn_conv1x1_block
from .registry import register_model
from .resnet import ResInitBlock
from .shell import ImageClassifier

__all__ = ["IBNResNeXt", "get_ibnresnext"]


class IBNResNeXtUnit(nn.Module):
    """IBN-ResNeXt unit (reference ibnresnext.py:73)."""

    out_channels: int = 0
    stride: int = 1
    cardinality: int = 32
    bottleneck_width: int = 4
    conv1_ibn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        resize_identity = (in_channels != self.out_channels) or \
            (self.stride != 1)
        if resize_identity:
            identity = conv1x1_block(
                out_channels=self.out_channels, stride=self.stride,
                activation=None, name="identity_conv")(x, train=train)
        else:
            identity = x
        mid_channels = self.out_channels // 4
        D = int(math.floor(mid_channels * (self.bottleneck_width / 64.0)))
        group_width = self.cardinality * D
        x = Sequential(layers=(
            ibn_conv1x1_block(out_channels=group_width,
                              use_ibn=self.conv1_ibn, name="conv1",
                              parent=None),
            conv3x3_block(out_channels=group_width, stride=self.stride,
                          groups=self.cardinality, name="conv2", parent=None),
            conv1x1_block(out_channels=self.out_channels, activation=None,
                          name="conv3", parent=None),
        ), name="body")(x, train=train)
        return nn.relu(x + identity)


def IBNResNeXt(channels, init_block_channels: int, cardinality: int,
               bottleneck_width: int, in_channels: int = 3,
               in_size: Tuple[int, int] = (224, 224),
               num_classes: int = 1000) -> ImageClassifier:
    """IBN-ResNeXt (reference ibnresnext.py:128)."""
    layers = [ResInitBlock(out_channels=init_block_channels,
                           name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(IBNResNeXtUnit(
                out_channels=out_channels, stride=stride,
                cardinality=cardinality, bottleneck_width=bottleneck_width,
                conv1_ibn=(out_channels < 2048), name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_ibnresnext(blocks: int, cardinality: int, bottleneck_width: int,
                   **kwargs):
    """Config expander (reference ibnresnext.py:219)."""
    table = {50: [3, 4, 6, 3], 101: [3, 4, 23, 3]}
    if blocks not in table:
        raise ValueError(f"Unsupported IBN-ResNeXt blocks: {blocks}")
    channels = [[ci] * li for ci, li in
                zip([256, 512, 1024, 2048], table[blocks])]
    return IBNResNeXt(channels=channels, init_block_channels=64,
                      cardinality=cardinality,
                      bottleneck_width=bottleneck_width, **kwargs)


@register_model("ibn_resnext50_32x4d")
def ibn_resnext50_32x4d(**kwargs):
    return get_ibnresnext(blocks=50, cardinality=32, bottleneck_width=4,
                          **kwargs)


@register_model("ibn_resnext101_32x4d")
def ibn_resnext101_32x4d(**kwargs):
    return get_ibnresnext(blocks=101, cardinality=32, bottleneck_width=4,
                          **kwargs)


@register_model("ibn_resnext101_64x4d")
def ibn_resnext101_64x4d(**kwargs):
    return get_ibnresnext(blocks=101, cardinality=64, bottleneck_width=4,
                          **kwargs)
