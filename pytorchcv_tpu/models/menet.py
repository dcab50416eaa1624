"""MENet, TPU-native. Behavioral reference: pytorchcv ``models/menet.py``
(MEUnit:12, MEInitBlock:116, MENet:153, get_menet:246). Merge-and-evolution:
a narrow side branch gates the depthwise bottleneck via sigmoid."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (BatchNorm, ChannelShuffle, Sequential, avg_pool2d,
                  conv1x1, conv3x3, depthwise_conv3x3, global_avg_pool2d,
                  max_pool2d)
from ..nn.base import dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["MENet", "get_menet"]


class MEUnit(nn.Module):
    """Merge-and-evolution unit (reference menet.py:12)."""

    out_channels: int = 0
    side_channels: int = 0
    groups: int = 1
    downsample: bool = False
    ignore_group: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out_channels = self.out_channels
        mid_channels = out_channels // 4
        if self.downsample:
            out_channels -= x.shape[-1]
        # pointwise group conv 1 + shuffle
        x = conv1x1(out_channels=mid_channels,
                    groups=(1 if self.ignore_group else self.groups),
                    name="compress_conv1")(x)
        x = BatchNorm(name="compress_bn1")(x, train=train)
        x = nn.relu(x)
        x = ChannelShuffle(groups=self.groups)(x)
        # merging
        y = conv1x1(out_channels=self.side_channels, name="s_merge_conv")(x)
        y = BatchNorm(name="s_merge_bn")(y, train=train)
        y = nn.relu(y)
        # depthwise bottleneck
        x = depthwise_conv3x3(channels=mid_channels,
                              stride=(2 if self.downsample else 1),
                              name="dw_conv2")(x)
        x = BatchNorm(name="dw_bn2")(x, train=train)
        # evolution
        y = conv3x3(out_channels=self.side_channels,
                    stride=(2 if self.downsample else 1), name="s_conv")(y)
        y = BatchNorm(name="s_conv_bn")(y, train=train)
        y = nn.relu(y)
        y = conv1x1(out_channels=mid_channels, name="s_evolve_conv")(y)
        y = BatchNorm(name="s_evolve_bn")(y, train=train)
        y = nn.sigmoid(y)
        x = x * y
        # pointwise group conv 2
        x = conv1x1(out_channels=out_channels, groups=self.groups,
                    name="expand_conv3")(x)
        x = BatchNorm(name="expand_bn3")(x, train=train)
        if self.downsample:
            identity = avg_pool2d(3, 2, padding=1)(identity)
            x = jnp.concatenate([x, identity], axis=-1)
        else:
            x = x + identity
        return nn.relu(x)


class MEInitBlock(nn.Module):
    """3x3 stride-2 conv + BN + ReLU + max pool (reference menet.py:116)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3(out_channels=self.out_channels, stride=2, name="conv")(x)
        x = BatchNorm(name="bn")(x, train=train)
        x = nn.relu(x)
        x = max_pool2d(3, 2, padding=1)(x)
        return x


def MENet(channels, init_block_channels: int, side_channels: int,
          groups: int, in_channels: int = 3,
          in_size: Tuple[int, int] = (224, 224),
          num_classes: int = 1000) -> ImageClassifier:
    """MENet (reference menet.py:153)."""
    layers = [MEInitBlock(out_channels=init_block_channels,
                          name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            units.append(MEUnit(
                out_channels=out_channels, side_channels=side_channels,
                groups=groups, downsample=(j == 0),
                ignore_group=(i == 0) and (j == 0), name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_menet(first_stage_channels: int, side_channels: int, groups: int,
              **kwargs):
    """Config expander (reference menet.py:246)."""
    layers = [4, 8, 4]
    table = {108: (12, [108, 216, 432]), 128: (12, [128, 256, 512]),
             160: (16, [160, 320, 640]), 228: (24, [228, 456, 912]),
             256: (24, [256, 512, 1024]), 348: (24, [348, 696, 1392]),
             352: (24, [352, 704, 1408]), 456: (48, [456, 912, 1824])}
    if first_stage_channels not in table:
        raise ValueError(
            f"Unsupported MENet first_stage_channels: {first_stage_channels}")
    init_block_channels, channels_per_layers = table[first_stage_channels]
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    return MENet(channels=channels, init_block_channels=init_block_channels,
                 side_channels=side_channels, groups=groups, **kwargs)


for _fsc, _side, _g in [(108, 8, 3), (128, 8, 4), (160, 8, 8), (228, 12, 3),
                        (256, 12, 4), (348, 12, 3), (352, 12, 8),
                        (456, 24, 3)]:
    _name = f"menet{_fsc}_{_side}x1_g{_g}"

    def _make(fsc=_fsc, side=_side, g=_g):
        def ctor(**kwargs):
            return get_menet(first_stage_channels=fsc, side_channels=side,
                             groups=g, **kwargs)
        return ctor
    _ctor = _make()
    _ctor.__name__ = _name
    register_model(_name)(_ctor)
