"""PeleeNet, TPU-native. Behavioral reference: pytorchcv
``models/peleenet.py`` (PeleeBranch1:15, PeleeBranch2:50, StemBlock:85,
DenseBlock:129, TransitionBlock:167, PeleeNet:196, get_peleenet:~280)."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (Concurrent, Sequential, avg_pool2d, conv1x1_block,
                  conv3x3_block, global_avg_pool2d, max_pool2d)
from ..nn.base import IntPair, dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["PeleeNet", "get_peleenet"]


class PeleeBranch1(nn.Module):
    """1x1 -> 3x3 (reference peleenet.py:15)."""

    out_channels: int = 0
    mid_channels: int = 0
    stride: IntPair = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv1x1_block(out_channels=self.mid_channels, name="conv1")(
            x, train=train)
        x = conv3x3_block(out_channels=self.out_channels, stride=self.stride,
                          name="conv2")(x, train=train)
        return x


class PeleeBranch2(nn.Module):
    """1x1 -> 3x3 -> 3x3 (reference peleenet.py:50)."""

    out_channels: int = 0
    mid_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv1x1_block(out_channels=self.mid_channels, name="conv1")(
            x, train=train)
        x = conv3x3_block(out_channels=self.out_channels, name="conv2")(
            x, train=train)
        x = conv3x3_block(out_channels=self.out_channels, name="conv3")(
            x, train=train)
        return x


class StemBlock(nn.Module):
    """Two-way dense stem (reference peleenet.py:85)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid1_channels = self.out_channels // 2
        x = conv3x3_block(out_channels=self.out_channels, stride=2,
                          name="first_conv")(x, train=train)
        branches = (
            PeleeBranch1(out_channels=self.out_channels,
                         mid_channels=mid1_channels, stride=2,
                         name="branch1", parent=None),
            max_pool2d(2, 2, 0),
        )
        x = Concurrent(layers=branches, name="branches")(x, train=train)
        x = conv1x1_block(out_channels=self.out_channels,
                          name="last_conv")(x, train=train)
        return x


class PeleeDenseBlock(nn.Module):
    """Two-branch dense unit (reference peleenet.py:129)."""

    out_channels: int = 0
    bottleneck_size: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        inc_channels = (self.out_channels - x.shape[-1]) // 2
        mid_channels = inc_channels * self.bottleneck_size
        x1 = PeleeBranch1(out_channels=inc_channels,
                          mid_channels=mid_channels, name="branch1")(
                              x, train=train)
        x2 = PeleeBranch2(out_channels=inc_channels,
                          mid_channels=mid_channels, name="branch2")(
                              x, train=train)
        return jnp.concatenate([x, x1, x2], axis=-1)


class PeleeTransitionBlock(nn.Module):
    """1x1 conv block + 2x2 avgpool (reference peleenet.py:167)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv1x1_block(out_channels=self.out_channels, name="conv")(
            x, train=train)
        return avg_pool2d(2, 2, 0)(x)


class PeleeOutput(nn.Module):
    """dropout + fc (reference peleenet.py:256-260)."""

    num_classes: int = 1000
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        if train and self.dropout_rate > 0:
            x = nn.Dropout(rate=self.dropout_rate, deterministic=False,
                           name="dropout")(x)
        return nn.Dense(self.num_classes, kernel_init=dense_kernel_init,
                        name="fc")(x)


def PeleeNet(channels, init_block_channels: int, bottleneck_sizes,
             dropout_rate: float = 0.5, in_channels: int = 3,
             in_size: Tuple[int, int] = (224, 224),
             num_classes: int = 1000) -> ImageClassifier:
    """PeleeNet (reference peleenet.py:196)."""
    layers = [StemBlock(out_channels=init_block_channels,
                        name="init_block")]
    in_ch = init_block_channels
    for i, channels_per_stage in enumerate(channels):
        units = []
        if i != 0:
            units.append(PeleeTransitionBlock(out_channels=in_ch,
                                              name=f"trans{i + 1}"))
        for j, out_channels in enumerate(channels_per_stage):
            units.append(PeleeDenseBlock(
                out_channels=out_channels,
                bottleneck_size=bottleneck_sizes[i],
                name=f"unit{j + 1}"))
            in_ch = out_channels
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(conv1x1_block(out_channels=in_ch, name="final_block"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=PeleeOutput(num_classes=num_classes,
                           dropout_rate=dropout_rate, name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_peleenet(**kwargs):
    """Config expander (reference peleenet.py:~280)."""
    init_block_channels = 32
    growth_rate = 32
    layers = [3, 4, 8, 6]
    bottleneck_sizes = [1, 2, 4, 4]
    channels = []
    last = init_block_channels
    for li in layers:
        stage = []
        c = last
        for _ in range(li):
            c += growth_rate
            stage.append(c)
        channels.append(stage)
        last = stage[-1]
    return PeleeNet(channels=channels,
                    init_block_channels=init_block_channels,
                    bottleneck_sizes=bottleneck_sizes, **kwargs)


@register_model("peleenet")
def peleenet(**kwargs):
    return get_peleenet(**kwargs)
