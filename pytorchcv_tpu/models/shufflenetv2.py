"""ShuffleNetV2, TPU-native. Behavioral reference: pytorchcv
``models/shufflenetv2.py`` (ShuffleUnit:17, ShuffleInitBlock:103,
ShuffleNetV2:134, get_shufflenetv2:217). Channel split + shuffle are free
layout ops under XLA.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (BatchNorm, SEBlock, Sequential, channel_shuffle,
                  conv1x1, conv1x1_block, conv3x3_block, depthwise_conv3x3,
                  global_avg_pool2d, max_pool2d)
from ..nn.base import dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["ShuffleNetV2", "ShuffleUnitV2", "get_shufflenetv2"]


class ShuffleUnitV2(nn.Module):
    """Channel-split two-branch unit (reference shufflenetv2.py:17)."""

    out_channels: int = 0
    downsample: bool = False
    use_se: bool = False
    use_residual: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        mid_channels = self.out_channels // 2
        if self.downsample:
            y1 = depthwise_conv3x3(channels=in_channels, stride=2,
                                   name="dw_conv4")(x)
            y1 = BatchNorm(name="dw_bn4")(y1, train=train)
            y1 = conv1x1(out_channels=mid_channels,
                         name="expand_conv5")(y1)
            y1 = BatchNorm(name="expand_bn5")(y1, train=train)
            y1 = nn.relu(y1)
            x2 = x
        else:
            y1, x2 = jnp.split(x, 2, axis=-1)
        y2 = conv1x1(out_channels=mid_channels, name="compress_conv1")(x2)
        y2 = BatchNorm(name="compress_bn1")(y2, train=train)
        y2 = nn.relu(y2)
        y2 = depthwise_conv3x3(channels=mid_channels,
                               stride=(2 if self.downsample else 1),
                               name="dw_conv2")(y2)
        y2 = BatchNorm(name="dw_bn2")(y2, train=train)
        y2 = conv1x1(out_channels=mid_channels, name="expand_conv3")(y2)
        y2 = BatchNorm(name="expand_bn3")(y2, train=train)
        y2 = nn.relu(y2)
        if self.use_se:
            y2 = SEBlock(channels=mid_channels, name="se")(y2)
        if self.use_residual and not self.downsample:
            y2 = y2 + x2
        x = jnp.concatenate([y1, y2], axis=-1)
        return channel_shuffle(x, 2)


class ShuffleInitBlockV2(nn.Module):
    """conv block 3x3/2 + ceil-mode maxpool (reference shufflenetv2.py:103)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.out_channels, stride=2,
                          name="conv")(x, train=train)
        return max_pool2d(3, 2, 0, ceil_mode=True)(x)


def ShuffleNetV2(channels, init_block_channels: int,
                 final_block_channels: int, use_se: bool = False,
                 use_residual: bool = False, in_channels: int = 3,
                 in_size: Tuple[int, int] = (224, 224),
                 num_classes: int = 1000) -> ImageClassifier:
    """ShuffleNetV2 (reference shufflenetv2.py:134)."""
    layers = [ShuffleInitBlockV2(out_channels=init_block_channels,
                                 name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            units.append(ShuffleUnitV2(
                out_channels=out_channels, downsample=(j == 0),
                use_se=use_se, use_residual=use_residual,
                name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(conv1x1_block(out_channels=final_block_channels,
                                name="final_block"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_shufflenetv2(width_scale: float, **kwargs):
    """Config expander (reference shufflenetv2.py:217)."""
    init_block_channels = 24
    final_block_channels = 1024
    layers = [4, 8, 4]
    channels_per_layers = [116, 232, 464]
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    if width_scale != 1.0:
        channels = [[int(cij * width_scale) for cij in ci] for ci in channels]
        if width_scale > 1.5:
            final_block_channels = int(final_block_channels * width_scale)
    return ShuffleNetV2(channels=channels,
                        init_block_channels=init_block_channels,
                        final_block_channels=final_block_channels, **kwargs)


def _variant(name, width_scale):
    @register_model(name)
    def ctor(**kwargs):
        return get_shufflenetv2(width_scale=width_scale, **kwargs)
    ctor.__name__ = name
    return ctor


shufflenetv2_wd2 = _variant("shufflenetv2_wd2", 12.0 / 29.0)
shufflenetv2_w1 = _variant("shufflenetv2_w1", 1.0)
shufflenetv2_w3d2 = _variant("shufflenetv2_w3d2", 44.0 / 29.0)
shufflenetv2_w2 = _variant("shufflenetv2_w2", 61.0 / 29.0)
