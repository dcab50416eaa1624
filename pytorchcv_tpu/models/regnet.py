"""RegNet(X/Y), TPU-native. Behavioral reference: pytorchcv
``models/regnet.py`` (RegNetBottleneck:18, RegNetUnit:75, RegNet:126,
get_regnet:200 — quantized linear width generator)."""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
from flax import linen as nn

from ..nn import (SEBlock, Sequential, conv1x1_block, conv3x3_block,
                  global_avg_pool2d)
from ..nn.base import IntPair, dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["RegNet", "get_regnet"]


class RegNetBottleneck(nn.Module):
    """1x1 -> grouped 3x3 -> [SE] -> 1x1 (reference regnet.py:18)."""

    out_channels: int = 0
    stride: IntPair = 1
    groups: int = 1
    use_se: bool = False
    bottleneck_factor: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        mid_channels = self.out_channels // self.bottleneck_factor
        mid_groups = mid_channels // self.groups
        x = conv1x1_block(out_channels=mid_channels, name="conv1")(
            x, train=train)
        x = conv3x3_block(out_channels=mid_channels, stride=self.stride,
                          groups=mid_groups, name="conv2")(x, train=train)
        if self.use_se:
            x = SEBlock(channels=mid_channels,
                        mid_channels=in_channels // 4, name="se")(x)
        x = conv1x1_block(out_channels=self.out_channels, activation=None,
                          name="conv3")(x, train=train)
        return x


class RegNetUnit(nn.Module):
    """RegNet residual unit (reference regnet.py:75)."""

    out_channels: int = 0
    stride: IntPair = 1
    groups: int = 1
    use_se: bool = False

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
        x = RegNetBottleneck(out_channels=self.out_channels,
                             stride=self.stride, groups=self.groups,
                             use_se=self.use_se, name="body")(x, train=train)
        return nn.relu(x + identity)


def RegNet(channels, init_block_channels: int, groups, use_se: bool,
           in_channels: int = 3, in_size: Tuple[int, int] = (224, 224),
           num_classes: int = 1000) -> ImageClassifier:
    """RegNet (reference regnet.py:126). Every stage downsamples."""
    layers = [conv3x3_block(out_channels=init_block_channels, stride=2,
                            name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) else 1
            units.append(RegNetUnit(out_channels=out_channels, stride=stride,
                                    groups=groups[i], use_se=use_se,
                                    name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_regnet(channels_init: float, channels_slope: float,
               channels_mult: float, depth: int, groups: int,
               use_se: bool = False, **kwargs):
    """Quantized linear width generator (reference regnet.py:200)."""
    divisor = 8
    assert (channels_slope >= 0 and channels_init > 0 and
            channels_mult > 1 and channels_init % divisor == 0)
    channels_cont = np.arange(depth) * channels_slope + channels_init
    channels_exps = np.round(
        np.log(channels_cont / channels_init) / np.log(channels_mult))
    channels = channels_init * np.power(channels_mult, channels_exps)
    channels = (np.round(channels / divisor) * divisor).astype(int)
    channels_per_stage, layers = np.unique(channels, return_counts=True)
    groups_per_stage = [min(groups, int(c)) for c in channels_per_stage]
    channels_per_stage = [int(round(c / g) * g) for c, g in
                          zip(channels_per_stage, groups_per_stage)]
    channels = [[ci] * int(li) for ci, li in
                zip(channels_per_stage, layers)]
    return RegNet(channels=channels, init_block_channels=32,
                  groups=groups_per_stage, use_se=use_se, **kwargs)


_CONFIGS = {
    "regnetx002": (24, 36.44, 2.49, 13, 8, False),
    "regnetx004": (24, 24.48, 2.54, 22, 16, False),
    "regnetx006": (48, 36.97, 2.24, 16, 24, False),
    "regnetx008": (56, 35.73, 2.28, 16, 16, False),
    "regnetx016": (80, 34.01, 2.25, 18, 24, False),
    "regnetx032": (88, 26.31, 2.25, 25, 48, False),
    "regnetx040": (96, 38.65, 2.43, 23, 40, False),
    "regnetx064": (184, 60.83, 2.07, 17, 56, False),
    "regnetx080": (80, 49.56, 2.88, 23, 120, False),
    "regnetx120": (168, 73.36, 2.37, 19, 112, False),
    "regnetx160": (216, 55.59, 2.1, 22, 128, False),
    "regnetx320": (320, 69.86, 2.0, 23, 168, False),
    "regnety002": (24, 36.44, 2.49, 13, 8, True),
    "regnety004": (48, 27.89, 2.09, 16, 8, True),
    "regnety006": (48, 32.54, 2.32, 15, 16, True),
    "regnety008": (56, 38.84, 2.4, 14, 16, True),
    "regnety016": (48, 20.71, 2.65, 27, 24, True),
    "regnety032": (80, 42.63, 2.66, 21, 24, True),
    "regnety040": (96, 31.41, 2.24, 22, 64, True),
    "regnety064": (112, 33.22, 2.27, 25, 72, True),
    "regnety080": (192, 76.82, 2.19, 17, 56, True),
    "regnety120": (168, 73.36, 2.37, 19, 112, True),
    "regnety160": (200, 106.23, 2.48, 18, 112, True),
    "regnety320": (232, 115.89, 2.53, 20, 232, True),
}


def _variant(name):
    ci, cs, cm, d, g, se = _CONFIGS[name]

    @register_model(name)
    def ctor(**kwargs):
        return get_regnet(channels_init=ci, channels_slope=cs,
                          channels_mult=cm, depth=d, groups=g, use_se=se,
                          **kwargs)
    ctor.__name__ = name
    return ctor


for _name in _CONFIGS:
    _variant(_name)
