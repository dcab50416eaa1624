"""ShuffleNet (v1), TPU-native. Behavioral reference: pytorchcv
``models/shufflenet.py`` (ShuffleUnit:16, ShuffleInitBlock:87,
ShuffleNet:122, get_shufflenet:197). Channel shuffle is a free
reshape/transpose under XLA; group convs run as grouped MXU matmuls.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (BatchNorm, Sequential, avg_pool2d, channel_shuffle,
                  conv1x1, conv3x3, depthwise_conv3x3, global_avg_pool2d,
                  max_pool2d)
from ..nn.base import dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["ShuffleNet", "ShuffleUnit", "ShuffleInitBlock", "get_shufflenet"]


class ShuffleUnit(nn.Module):
    """compress gconv1x1 -> shuffle -> dw3x3 -> expand gconv1x1; concat
    shortcut on downsample (reference shufflenet.py:16)."""

    out_channels: int = 0
    groups: int = 1
    downsample: bool = False
    ignore_group: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        out_channels = self.out_channels
        mid_channels = out_channels // 4
        if self.downsample:
            out_channels -= in_channels
        identity = x
        x = conv1x1(out_channels=mid_channels,
                    groups=(1 if self.ignore_group else self.groups),
                    name="compress_conv1")(x)
        x = BatchNorm(name="compress_bn1")(x, train=train)
        x = nn.relu(x)
        x = channel_shuffle(x, self.groups)
        x = depthwise_conv3x3(channels=mid_channels,
                              stride=(2 if self.downsample else 1),
                              name="dw_conv2")(x)
        x = BatchNorm(name="dw_bn2")(x, train=train)
        x = conv1x1(out_channels=out_channels, groups=self.groups,
                    name="expand_conv3")(x)
        x = BatchNorm(name="expand_bn3")(x, train=train)
        if self.downsample:
            identity = avg_pool2d(3, 2, 1)(identity)
            x = jnp.concatenate([x, identity], axis=-1)
        else:
            x = x + identity
        return nn.relu(x)


class ShuffleInitBlock(nn.Module):
    """conv3x3/2 + BN + ReLU + maxpool (reference shufflenet.py:87)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3(out_channels=self.out_channels, stride=2,
                    name="conv")(x)
        x = BatchNorm(name="bn")(x, train=train)
        x = nn.relu(x)
        return max_pool2d(3, 2, 1)(x)


def ShuffleNet(channels, init_block_channels: int, groups: int,
               in_channels: int = 3, in_size: Tuple[int, int] = (224, 224),
               num_classes: int = 1000) -> ImageClassifier:
    """ShuffleNet (reference shufflenet.py:122)."""
    layers = [ShuffleInitBlock(out_channels=init_block_channels,
                               name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            units.append(ShuffleUnit(
                out_channels=out_channels, groups=groups,
                downsample=(j == 0), ignore_group=(i == 0) and (j == 0),
                name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_shufflenet(groups: int, width_scale: float, **kwargs):
    """Config expander (reference shufflenet.py:197)."""
    init_block_channels = 24
    layers = [4, 8, 4]
    channels_table = {1: [144, 288, 576], 2: [200, 400, 800],
                      3: [240, 480, 960], 4: [272, 544, 1088],
                      8: [384, 768, 1536]}
    if groups not in channels_table:
        raise ValueError(f"Unsupported ShuffleNet groups: {groups}")
    channels_per_layers = channels_table[groups]
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    if width_scale != 1.0:
        channels = [[int(cij * width_scale) for cij in ci] for ci in channels]
        init_block_channels = int(init_block_channels * width_scale)
    return ShuffleNet(channels=channels,
                      init_block_channels=init_block_channels,
                      groups=groups, **kwargs)


def _variant(name, groups, width_scale):
    @register_model(name)
    def ctor(**kwargs):
        return get_shufflenet(groups=groups, width_scale=width_scale,
                              **kwargs)
    ctor.__name__ = name
    return ctor


shufflenet_g1_w1 = _variant("shufflenet_g1_w1", 1, 1.0)
shufflenet_g2_w1 = _variant("shufflenet_g2_w1", 2, 1.0)
shufflenet_g3_w1 = _variant("shufflenet_g3_w1", 3, 1.0)
shufflenet_g4_w1 = _variant("shufflenet_g4_w1", 4, 1.0)
shufflenet_g8_w1 = _variant("shufflenet_g8_w1", 8, 1.0)
shufflenet_g1_w3d4 = _variant("shufflenet_g1_w3d4", 1, 0.75)
shufflenet_g3_w3d4 = _variant("shufflenet_g3_w3d4", 3, 0.75)
shufflenet_g1_wd2 = _variant("shufflenet_g1_wd2", 1, 0.5)
shufflenet_g3_wd2 = _variant("shufflenet_g3_wd2", 3, 0.5)
shufflenet_g1_wd4 = _variant("shufflenet_g1_wd4", 1, 0.25)
shufflenet_g3_wd4 = _variant("shufflenet_g3_wd4", 3, 0.25)
