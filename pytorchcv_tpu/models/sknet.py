"""SKNet (Selective Kernel), TPU-native. Behavioral reference: pytorchcv
``models/sknet.py`` (SKConvBlock:15, SKNetBottleneck:86, SKNetUnit:~140,
SKNet:~190). Multi-dilation branches with softmax kernel selection.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import (Concurrent, Sequential, conv1x1, conv1x1_block,
                  conv3x3_block, global_avg_pool2d)
from ..nn.base import IntPair, dense_kernel_init
from .registry import register_model
from .resnet import ResInitBlock
from .shell import ImageClassifier

__all__ = ["SKNet", "SKConvBlock", "get_sknet"]


class SKConvBlock(nn.Module):
    """Selective-kernel conv block (reference sknet.py:15)."""

    out_channels: int = 0
    stride: IntPair = 1
    groups: int = 32
    num_branches: int = 2
    reduction: int = 16
    min_channels: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        mid_channels = max(in_channels // self.reduction, self.min_channels)
        branches = []
        for i in range(self.num_branches):
            dilation = 1 + i
            branches.append(conv3x3_block(
                out_channels=self.out_channels, stride=self.stride,
                padding=dilation, dilation=dilation, groups=self.groups,
                name=f"branch{i + 2}", parent=None))
        y = Concurrent(layers=tuple(branches), stack=True,
                       name="branches")(x, train=train)   # (B, M, H, W, C)
        u = y.sum(axis=1)
        s = jnp.mean(u, axis=(1, 2), keepdims=True)
        z = conv1x1_block(out_channels=mid_channels, name="fc1")(
            s, train=train)
        w = conv1x1(out_channels=self.out_channels * self.num_branches,
                    name="fc2")(z)
        w = w.reshape(w.shape[0], self.num_branches, self.out_channels)
        w = jax.nn.softmax(w, axis=1)
        w = w[:, :, None, None, :]
        return (y * w).sum(axis=1)


class SKNetBottleneck(nn.Module):
    """1x1 -> SKConv -> 1x1 (reference sknet.py:86)."""

    out_channels: int = 0
    stride: IntPair = 1
    bottleneck_factor: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = self.out_channels // self.bottleneck_factor
        x = conv1x1_block(out_channels=mid_channels, name="conv1")(
            x, train=train)
        x = SKConvBlock(out_channels=mid_channels, stride=self.stride,
                        name="conv2")(x, train=train)
        x = conv1x1_block(out_channels=self.out_channels, activation=None,
                          name="conv3")(x, train=train)
        return x


class SKNetUnit(nn.Module):
    """SKNet residual unit (reference sknet.py:~140)."""

    out_channels: int = 0
    stride: IntPair = 1

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
        x = SKNetBottleneck(out_channels=self.out_channels,
                            stride=self.stride, name="body")(x, train=train)
        return nn.relu(x + identity)


def SKNet(channels, init_block_channels: int, in_channels: int = 3,
          in_size: Tuple[int, int] = (224, 224),
          num_classes: int = 1000) -> ImageClassifier:
    """SKNet (reference sknet.py:~190)."""
    layers = [ResInitBlock(out_channels=init_block_channels,
                           name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(SKNetUnit(out_channels=out_channels, stride=stride,
                                   name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_sknet(blocks: int, **kwargs):
    """Config expander (reference sknet.py:~250)."""
    layers_table = {50: [3, 4, 6, 3], 101: [3, 4, 23, 3],
                    152: [3, 8, 36, 3]}
    if blocks not in layers_table:
        raise ValueError(f"Unsupported SKNet blocks: {blocks}")
    layers = layers_table[blocks]
    channels_per_layers = [256, 512, 1024, 2048]
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    return SKNet(channels=channels, init_block_channels=64, **kwargs)


def _variant(name, blocks):
    @register_model(name)
    def ctor(**kwargs):
        return get_sknet(blocks=blocks, **kwargs)
    ctor.__name__ = name
    return ctor


sknet50 = _variant("sknet50", 50)
sknet101 = _variant("sknet101", 101)
sknet152 = _variant("sknet152", 152)
