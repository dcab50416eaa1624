"""SENet, TPU-native. Behavioral reference: pytorchcv ``models/senet.py``
(SENetBottleneck:16, SENetUnit:64, SEInitBlock:126, SENet:170,
get_senet:~240). Grouped bottleneck with halved first width; deep 3-conv
stem; dropout before the classifier."""

from __future__ import annotations

import math
from typing import Tuple

from flax import linen as nn

from ..nn import (SEBlock, Sequential, conv1x1_block, conv3x3_block,
                  global_avg_pool2d, max_pool2d)
from ..nn.base import IntPair, dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["SENet", "SENetUnit", "SEInitBlock", "get_senet"]


class SENetBottleneck(nn.Module):
    """1x1 (width/2) -> grouped 3x3 -> 1x1 (reference senet.py:16)."""

    out_channels: int = 0
    stride: IntPair = 1
    cardinality: int = 32
    bottleneck_width: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = self.out_channels // 4
        D = int(math.floor(mid_channels * (self.bottleneck_width / 64.0)))
        group_width = self.cardinality * D
        group_width2 = group_width // 2
        x = conv1x1_block(out_channels=group_width2, name="conv1")(
            x, train=train)
        x = conv3x3_block(out_channels=group_width, stride=self.stride,
                          groups=self.cardinality, name="conv2")(
                              x, train=train)
        x = conv1x1_block(out_channels=self.out_channels, activation=None,
                          name="conv3")(x, train=train)
        return x


class SENetUnit(nn.Module):
    """SENet residual unit (reference senet.py:64)."""

    out_channels: int = 0
    stride: IntPair = 1
    cardinality: int = 32
    bottleneck_width: int = 4
    identity_conv3x3: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        resize_identity = (x.shape[-1] != self.out_channels) or \
            (self.stride != 1)
        if resize_identity:
            conv = conv3x3_block if self.identity_conv3x3 else conv1x1_block
            identity = conv(out_channels=self.out_channels,
                            stride=self.stride, activation=None,
                            name="identity_conv")(x, train=train)
        else:
            identity = x
        x = SENetBottleneck(out_channels=self.out_channels,
                            stride=self.stride,
                            cardinality=self.cardinality,
                            bottleneck_width=self.bottleneck_width,
                            name="body")(x, train=train)
        x = SEBlock(channels=self.out_channels, name="se")(x)
        return nn.relu(x + identity)


class SEInitBlock(nn.Module):
    """Deep 3-conv stem + maxpool (reference senet.py:126)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = self.out_channels // 2
        x = conv3x3_block(out_channels=mid_channels, stride=2,
                          name="conv1")(x, train=train)
        x = conv3x3_block(out_channels=mid_channels, name="conv2")(
            x, train=train)
        x = conv3x3_block(out_channels=self.out_channels, name="conv3")(
            x, train=train)
        return max_pool2d(3, 2, 1)(x)


class SENetOutput(nn.Module):
    """dropout + fc (reference senet.py:223-226)."""

    num_classes: int = 1000
    dropout_rate: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        if train and self.dropout_rate > 0:
            x = nn.Dropout(rate=self.dropout_rate, deterministic=False,
                           name="dropout")(x)
        return nn.Dense(self.num_classes, kernel_init=dense_kernel_init,
                        name="fc")(x)


def SENet(channels, init_block_channels: int, cardinality: int,
          bottleneck_width: int, in_channels: int = 3,
          in_size: Tuple[int, int] = (224, 224),
          num_classes: int = 1000) -> ImageClassifier:
    """SENet (reference senet.py:170)."""
    layers = [SEInitBlock(out_channels=init_block_channels,
                          name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        identity_conv3x3 = (i != 0)
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(SENetUnit(
                out_channels=out_channels, stride=stride,
                cardinality=cardinality, bottleneck_width=bottleneck_width,
                identity_conv3x3=identity_conv3x3, name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=SENetOutput(num_classes=num_classes, name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_senet(blocks: int, **kwargs):
    """Config expander (reference senet.py:~240)."""
    table = {16: ([1, 1, 1, 1], 32), 28: ([2, 2, 2, 2], 32),
             40: ([3, 3, 3, 3], 32), 52: ([3, 4, 6, 3], 32),
             103: ([3, 4, 23, 3], 32), 154: ([3, 8, 36, 3], 64)}
    if blocks not in table:
        raise ValueError(f"Unsupported SENet blocks: {blocks}")
    layers, cardinality = table[blocks]
    channels_per_layers = [256, 512, 1024, 2048]
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    return SENet(channels=channels, init_block_channels=128,
                 cardinality=cardinality, bottleneck_width=4, **kwargs)


def _variant(name, blocks):
    @register_model(name)
    def ctor(**kwargs):
        return get_senet(blocks=blocks, **kwargs)
    ctor.__name__ = name
    return ctor


senet16 = _variant("senet16", 16)
senet28 = _variant("senet28", 28)
senet40 = _variant("senet40", 40)
senet52 = _variant("senet52", 52)
senet103 = _variant("senet103", 103)
senet154 = _variant("senet154", 154)
