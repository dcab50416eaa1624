"""ShuffleNetV2(b), TPU-native. Behavioral reference: pytorchcv
``models/shufflenetv2b.py`` (ShuffleUnit:17, ShuffleInitBlock:105,
ShuffleNetV2b:147, get_shufflenetv2b:224). Differs from v2 in conv-block
composition, shortcut ordering, maxpool padding, and shuffle variant.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (SEBlock, Sequential, channel_shuffle, channel_shuffle2,
                  conv1x1_block, conv3x3_block, dwconv3x3_block,
                  global_avg_pool2d, max_pool2d)
from ..nn.base import dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["ShuffleNetV2b", "get_shufflenetv2b"]


class ShuffleUnitV2b(nn.Module):
    """Channel-split two-branch unit, conv-block composition
    (reference shufflenetv2b.py:17)."""

    out_channels: int = 0
    downsample: bool = False
    use_se: bool = False
    use_residual: bool = False
    shuffle_group_first: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        mid_channels = self.out_channels // 2
        in_channels2 = in_channels // 2
        y2_in_channels = in_channels if self.downsample else in_channels2
        y2_out_channels = self.out_channels - y2_in_channels
        if self.downsample:
            y1 = dwconv3x3_block(out_channels=in_channels, stride=2,
                                 activation=None,
                                 name="shortcut_dconv")(x, train=train)
            y1 = conv1x1_block(out_channels=in_channels,
                               name="shortcut_conv")(y1, train=train)
            x2 = x
        else:
            y1, x2 = jnp.split(x, 2, axis=-1)
        y2 = conv1x1_block(out_channels=mid_channels,
                           name="conv1")(x2, train=train)
        y2 = dwconv3x3_block(out_channels=mid_channels,
                             stride=(2 if self.downsample else 1),
                             activation=None, name="dconv")(y2, train=train)
        y2 = conv1x1_block(out_channels=y2_out_channels,
                           name="conv2")(y2, train=train)
        if self.use_se:
            y2 = SEBlock(channels=y2_out_channels, name="se")(y2)
        if self.use_residual and not self.downsample:
            y2 = y2 + x2
        x = jnp.concatenate([y1, y2], axis=-1)
        if self.shuffle_group_first:
            return channel_shuffle(x, 2)
        return channel_shuffle2(x, 2)


class ShuffleInitBlockV2b(nn.Module):
    """conv block 3x3/2 + maxpool 3/2/1 (reference shufflenetv2b.py:105)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.out_channels, stride=2,
                          name="conv")(x, train=train)
        return max_pool2d(3, 2, 1)(x)


def ShuffleNetV2b(channels, init_block_channels: int,
                  final_block_channels: int, use_se: bool = False,
                  use_residual: bool = False,
                  shuffle_group_first: bool = True, in_channels: int = 3,
                  in_size: Tuple[int, int] = (224, 224),
                  num_classes: int = 1000) -> ImageClassifier:
    """ShuffleNetV2b (reference shufflenetv2b.py:147)."""
    layers = [ShuffleInitBlockV2b(out_channels=init_block_channels,
                                  name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            units.append(ShuffleUnitV2b(
                out_channels=out_channels, downsample=(j == 0),
                use_se=use_se, use_residual=use_residual,
                shuffle_group_first=shuffle_group_first,
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


def get_shufflenetv2b(width_scale: float, shuffle_group_first: bool = True,
                      **kwargs):
    """Config expander (reference shufflenetv2b.py:224)."""
    init_block_channels = 24
    final_block_channels = 1024
    layers = [4, 8, 4]
    channels_per_layers = [116, 232, 464]
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    if width_scale != 1.0:
        channels = [[int(cij * width_scale) for cij in ci] for ci in channels]
        if width_scale > 1.5:
            final_block_channels = int(final_block_channels * width_scale)
    return ShuffleNetV2b(channels=channels,
                         init_block_channels=init_block_channels,
                         final_block_channels=final_block_channels,
                         shuffle_group_first=shuffle_group_first, **kwargs)


def _variant(name, width_scale):
    @register_model(name)
    def ctor(**kwargs):
        return get_shufflenetv2b(width_scale=width_scale,
                                 shuffle_group_first=True, **kwargs)
    ctor.__name__ = name
    return ctor


shufflenetv2b_wd2 = _variant("shufflenetv2b_wd2", 12.0 / 29.0)
shufflenetv2b_w1 = _variant("shufflenetv2b_w1", 1.0)
shufflenetv2b_w3d2 = _variant("shufflenetv2b_w3d2", 44.0 / 29.0)
shufflenetv2b_w2 = _variant("shufflenetv2b_w2", 61.0 / 29.0)
