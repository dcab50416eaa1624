"""ResNeXt, TPU-native. Behavioral reference: pytorchcv
``models/resnext.py`` (ResNeXtBottleneck:17, ResNeXtUnit:67, ResNeXt:118,
get_resnext:193). Group convs are grouped MXU matmuls under XLA.
"""

from __future__ import annotations

import math
from typing import Tuple

from flax import linen as nn

from ..nn import (Sequential, conv1x1_block, conv3x3_block,
                  global_avg_pool2d)
from ..nn.base import IntPair, dense_kernel_init
from .registry import register_model
from .resnet import ResInitBlock
from .shell import ImageClassifier

__all__ = ["ResNeXt", "ResNeXtBottleneck", "ResNeXtUnit", "get_resnext"]


class ResNeXtBottleneck(nn.Module):
    """1x1 -> grouped 3x3 -> 1x1 (reference resnext.py:17)."""

    out_channels: int = 0
    stride: IntPair = 1
    cardinality: int = 32
    bottleneck_width: int = 4
    bottleneck_factor: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = self.out_channels // self.bottleneck_factor
        D = int(math.floor(mid_channels * (self.bottleneck_width / 64.0)))
        group_width = self.cardinality * D
        x = conv1x1_block(out_channels=group_width, name="conv1")(
            x, train=train)
        x = conv3x3_block(out_channels=group_width, stride=self.stride,
                          groups=self.cardinality, name="conv2")(
                              x, train=train)
        x = conv1x1_block(out_channels=self.out_channels, activation=None,
                          name="conv3")(x, train=train)
        return x


class ResNeXtUnit(nn.Module):
    """ResNeXt residual unit (reference resnext.py:67)."""

    out_channels: int = 0
    stride: IntPair = 1
    cardinality: int = 32
    bottleneck_width: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        resize_identity = (x.shape[-1] != self.out_channels) or \
            (self.stride != 1)
        if resize_identity:
            identity = conv1x1_block(out_channels=self.out_channels,
                                     stride=self.stride, activation=None,
                                     name="identity_conv")(x, train=train)
        else:
            identity = x
        x = ResNeXtBottleneck(out_channels=self.out_channels,
                              stride=self.stride,
                              cardinality=self.cardinality,
                              bottleneck_width=self.bottleneck_width,
                              name="body")(x, train=train)
        return nn.relu(x + identity)


def ResNeXt(channels, init_block_channels: int, cardinality: int,
            bottleneck_width: int, in_channels: int = 3,
            in_size: Tuple[int, int] = (224, 224),
            num_classes: int = 1000) -> ImageClassifier:
    """ResNeXt (reference resnext.py:118)."""
    layers = [ResInitBlock(out_channels=init_block_channels,
                           name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(ResNeXtUnit(
                out_channels=out_channels, stride=stride,
                cardinality=cardinality, bottleneck_width=bottleneck_width,
                name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


_LAYERS = {14: [1, 1, 1, 1], 26: [2, 2, 2, 2], 38: [3, 3, 3, 3],
           50: [3, 4, 6, 3], 101: [3, 4, 23, 3]}


def get_resnext(blocks: int, cardinality: int, bottleneck_width: int,
                **kwargs):
    """Config expander (reference resnext.py:193)."""
    if blocks not in _LAYERS:
        raise ValueError(f"Unsupported ResNeXt blocks: {blocks}")
    layers = _LAYERS[blocks]
    assert sum(layers) * 3 + 2 == blocks
    channels_per_layers = [256, 512, 1024, 2048]
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    return ResNeXt(channels=channels, init_block_channels=64,
                   cardinality=cardinality,
                   bottleneck_width=bottleneck_width, **kwargs)


def _variant(name, blocks, cardinality, bottleneck_width):
    @register_model(name)
    def ctor(**kwargs):
        return get_resnext(blocks=blocks, cardinality=cardinality,
                           bottleneck_width=bottleneck_width, **kwargs)
    ctor.__name__ = name
    return ctor


resnext14_16x4d = _variant("resnext14_16x4d", 14, 16, 4)
resnext14_32x2d = _variant("resnext14_32x2d", 14, 32, 2)
resnext14_32x4d = _variant("resnext14_32x4d", 14, 32, 4)
resnext26_16x4d = _variant("resnext26_16x4d", 26, 16, 4)
resnext26_32x2d = _variant("resnext26_32x2d", 26, 32, 2)
resnext26_32x4d = _variant("resnext26_32x4d", 26, 32, 4)
resnext38_32x4d = _variant("resnext38_32x4d", 38, 32, 4)
resnext50_32x4d = _variant("resnext50_32x4d", 50, 32, 4)
resnext101_32x4d = _variant("resnext101_32x4d", 101, 32, 4)
resnext101_64x4d = _variant("resnext101_64x4d", 101, 64, 4)
