"""AirNet / AirNeXt, TPU-native. Behavioral reference: pytorchcv
``models/airnet.py`` (AirBlock:13, AirBottleneck:73, AirUnit:126,
AirInitBlock:180, AirNet:224, get_airnet:296) and ``models/airnext.py``
(AirNeXtBottleneck:16, AirNeXtUnit:90, AirNeXt:146, get_airnext:212)."""

from __future__ import annotations

import math
from typing import Tuple

from flax import linen as nn

from ..nn import (InterpolationBlock, Sequential, conv1x1_block,
                  conv3x3_block, global_avg_pool2d, max_pool2d)
from ..nn.base import dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["AirNet", "AirNeXt", "AirBlock", "AirInitBlock", "get_airnet",
           "get_airnext"]


class AirBlock(nn.Module):
    """Attention branch: down-pool conv pyramid + sigmoid gate
    (reference airnet.py:13)."""

    out_channels: int = 0
    groups: int = 1
    ratio: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = self.out_channels // self.ratio
        x = conv1x1_block(out_channels=mid_channels,
                          name="conv1")(x, train=train)
        x = max_pool2d(3, 2, padding=1)(x)
        x = conv3x3_block(out_channels=mid_channels, groups=self.groups,
                          name="conv2")(x, train=train)
        # torch F.interpolate(scale_factor=2, bilinear, align_corners=True)
        x = InterpolationBlock(mode="bilinear", align_corners=True)(
            x, size=(2 * x.shape[1], 2 * x.shape[2]))
        x = conv1x1_block(out_channels=self.out_channels, activation=None,
                          name="conv3")(x, train=train)
        return nn.sigmoid(x)


class AirBottleneck(nn.Module):
    """Bottleneck with attention gate on the 3x3 conv (reference
    airnet.py:73; with ``cardinality > 0`` — airnext.py:16)."""

    out_channels: int = 0
    stride: int = 1
    ratio: int = 2
    cardinality: int = 0
    bottleneck_width: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = self.out_channels // 4
        if self.cardinality > 0:
            D = int(math.floor(mid_channels * (self.bottleneck_width / 64.0)))
            group_width = self.cardinality * D
            groups = self.cardinality
            air_groups = self.cardinality // self.ratio
        else:
            group_width = mid_channels
            groups = 1
            air_groups = 1
        use_air_block = (self.stride == 1 and mid_channels < 512)
        if use_air_block:
            att = AirBlock(out_channels=group_width, groups=air_groups,
                           ratio=self.ratio, name="air")(x, train=train)
        x = conv1x1_block(out_channels=group_width,
                          name="conv1")(x, train=train)
        x = conv3x3_block(out_channels=group_width, stride=self.stride,
                          groups=groups, name="conv2")(x, train=train)
        if use_air_block:
            x = x * att
        x = conv1x1_block(out_channels=self.out_channels, activation=None,
                          name="conv3")(x, train=train)
        return x


class AirUnit(nn.Module):
    """AirNet residual unit (reference airnet.py:126). With
    ``cardinality > 0`` acts as the AirNeXt unit (reference airnext.py:90)."""

    out_channels: int = 0
    stride: int = 1
    ratio: int = 2
    cardinality: int = 0
    bottleneck_width: int = 4

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
        y = AirBottleneck(out_channels=self.out_channels, stride=self.stride,
                          ratio=self.ratio, cardinality=self.cardinality,
                          bottleneck_width=self.bottleneck_width,
                          name="body")(x, train=train)
        return nn.relu(y + identity)


class AirInitBlock(nn.Module):
    """3-conv stem + max pool (reference airnet.py:180)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = self.out_channels // 2
        x = conv3x3_block(out_channels=mid_channels, stride=2,
                          name="conv1")(x, train=train)
        x = conv3x3_block(out_channels=mid_channels,
                          name="conv2")(x, train=train)
        x = conv3x3_block(out_channels=self.out_channels,
                          name="conv3")(x, train=train)
        return max_pool2d(3, 2, padding=1)(x)


def _air_classifier(channels, init_block_channels, ratio, cardinality,
                    bottleneck_width, in_channels, in_size, num_classes):
    layers = [AirInitBlock(out_channels=init_block_channels,
                           name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(AirUnit(out_channels=out_channels, stride=stride,
                                 ratio=ratio, cardinality=cardinality,
                                 bottleneck_width=bottleneck_width,
                                 name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def AirNet(channels, init_block_channels: int, ratio: int,
           in_channels: int = 3, in_size: Tuple[int, int] = (224, 224),
           num_classes: int = 1000) -> ImageClassifier:
    """AirNet (reference airnet.py:224)."""
    return _air_classifier(channels, init_block_channels, ratio, 0, 4,
                           in_channels, in_size, num_classes)


def AirNeXt(channels, init_block_channels: int, cardinality: int,
            bottleneck_width: int, ratio: int, in_channels: int = 3,
            in_size: Tuple[int, int] = (224, 224),
            num_classes: int = 1000) -> ImageClassifier:
    """AirNeXt (reference airnext.py:146)."""
    return _air_classifier(channels, init_block_channels, ratio, cardinality,
                           bottleneck_width, in_channels, in_size,
                           num_classes)


def get_airnet(blocks: int, base_channels: int, ratio: int, **kwargs):
    """Config expander (reference airnet.py:296)."""
    table = {50: [3, 4, 6, 3], 101: [3, 4, 23, 3]}
    if blocks not in table:
        raise ValueError(f"Unsupported AirNet blocks: {blocks}")
    layers = table[blocks]
    channels = [[base_channels * (2 ** i) * 4] * li
                for i, li in enumerate(layers)]
    return AirNet(channels=channels, init_block_channels=base_channels,
                  ratio=ratio, **kwargs)


def get_airnext(blocks: int, cardinality: int, bottleneck_width: int,
                base_channels: int, ratio: int, **kwargs):
    """Config expander (reference airnext.py:212)."""
    table = {50: [3, 4, 6, 3], 101: [3, 4, 23, 3]}
    if blocks not in table:
        raise ValueError(f"Unsupported AirNeXt blocks: {blocks}")
    layers = table[blocks]
    channels = [[base_channels * (2 ** i) * 4] * li
                for i, li in enumerate(layers)]
    return AirNeXt(channels=channels, init_block_channels=base_channels,
                   cardinality=cardinality,
                   bottleneck_width=bottleneck_width, ratio=ratio, **kwargs)


@register_model("airnet50_1x64d_r2")
def airnet50_1x64d_r2(**kwargs):
    return get_airnet(blocks=50, base_channels=64, ratio=2, **kwargs)


@register_model("airnet50_1x64d_r16")
def airnet50_1x64d_r16(**kwargs):
    return get_airnet(blocks=50, base_channels=64, ratio=16, **kwargs)


@register_model("airnet101_1x64d_r2")
def airnet101_1x64d_r2(**kwargs):
    return get_airnet(blocks=101, base_channels=64, ratio=2, **kwargs)


@register_model("airnext50_32x4d_r2")
def airnext50_32x4d_r2(**kwargs):
    return get_airnext(blocks=50, cardinality=32, bottleneck_width=4,
                       base_channels=64, ratio=2, **kwargs)


@register_model("airnext101_32x4d_r2")
def airnext101_32x4d_r2(**kwargs):
    return get_airnext(blocks=101, cardinality=32, bottleneck_width=4,
                       base_channels=64, ratio=2, **kwargs)


@register_model("airnext101_32x4d_r16")
def airnext101_32x4d_r16(**kwargs):
    return get_airnext(blocks=101, cardinality=32, bottleneck_width=4,
                       base_channels=64, ratio=16, **kwargs)
