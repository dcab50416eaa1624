"""PyramidNet, TPU-native. Behavioral reference: pytorchcv
``models/pyramidnet.py`` (PyrBlock:15, PyrBottleneck:48, PyrUnit:87,
PyrInitBlock:140, PyramidNet:177, get_pyramidnet:247). Additive channel
growth per unit; identity branch zero-pads new channels.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (BatchNorm, Sequential, avg_pool2d, global_avg_pool2d,
                  max_pool2d, pre_conv1x1_block, pre_conv3x3_block)
from ..nn.base import IntPair, dense_kernel_init
from ..nn.conv import _conv2d
from .preresnet import PreResActivation
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["PyramidNet", "PyrUnit", "get_pyramidnet", "pyramidnet_channels"]


class PyrBlock(nn.Module):
    """pre-act 3x3 (no first act) x2 (reference pyramidnet.py:15)."""

    out_channels: int = 0
    stride: IntPair = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = pre_conv3x3_block(out_channels=self.out_channels,
                              stride=self.stride, activate=False,
                              name="conv1")(x, train=train)
        x = pre_conv3x3_block(out_channels=self.out_channels,
                              name="conv2")(x, train=train)
        return x


class PyrBottleneck(nn.Module):
    """pre-act 1x1 (no first act) -> 3x3 -> 1x1
    (reference pyramidnet.py:34)."""

    out_channels: int = 0
    stride: IntPair = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = self.out_channels // 4
        x = pre_conv1x1_block(out_channels=mid_channels, activate=False,
                              name="conv1")(x, train=train)
        x = pre_conv3x3_block(out_channels=mid_channels, stride=self.stride,
                              name="conv2")(x, train=train)
        x = pre_conv1x1_block(out_channels=self.out_channels,
                              name="conv3")(x, train=train)
        return x


class PyrUnit(nn.Module):
    """Pyramid unit: body + BN; identity avg-pooled on stride and channel
    zero-padded (reference pyramidnet.py:87)."""

    out_channels: int = 0
    stride: IntPair = 1
    bottleneck: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        assert self.out_channels >= in_channels
        resize_identity = (self.stride != 1)
        identity = x
        if self.bottleneck:
            x = PyrBottleneck(out_channels=self.out_channels,
                              stride=self.stride, name="body")(
                                  x, train=train)
        else:
            x = PyrBlock(out_channels=self.out_channels, stride=self.stride,
                         name="body")(x, train=train)
        x = BatchNorm(name="bn")(x, train=train)
        if resize_identity:
            identity = avg_pool2d(2, self.stride, 0,
                                  ceil_mode=True)(identity)
        pad = self.out_channels - in_channels
        if pad > 0:
            identity = jnp.pad(identity,
                               ((0, 0), (0, 0), (0, 0), (0, pad)))
        return x + identity


class PyrInitBlock(nn.Module):
    """7x7/2 conv + BN + ReLU + maxpool (reference pyramidnet.py:140)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv2d(self.out_channels, 7, 2, 3, name="conv")(x)
        x = BatchNorm(name="bn")(x, train=train)
        x = nn.relu(x)
        return max_pool2d(3, 2, 1)(x)


def pyramidnet_channels(init_block_channels: int, alpha: int, layers,
                        bottleneck: bool):
    """Additive width plan (reference pyramidnet.py:299-312): float
    accumulation across stages, rounded per unit, x4 for bottleneck."""
    growth_add = float(alpha) / float(sum(layers))
    channels = []
    last = float(init_block_channels)
    for li in layers:
        stage = [(i + 1) * growth_add + last for i in range(li)]
        channels.append(stage)
        last = stage[-1]
    channels = [[int(round(c)) for c in ci] for ci in channels]
    if bottleneck:
        channels = [[c * 4 for c in ci] for ci in channels]
    return channels


def PyramidNet(channels, init_block_channels: int, bottleneck: bool,
               in_channels: int = 3, in_size: Tuple[int, int] = (224, 224),
               num_classes: int = 1000) -> ImageClassifier:
    """PyramidNet (reference pyramidnet.py:177)."""
    layers = [PyrInitBlock(out_channels=init_block_channels,
                           name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(PyrUnit(out_channels=out_channels, stride=stride,
                                 bottleneck=bottleneck,
                                 name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(PreResActivation(name="post_activ"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_pyramidnet(blocks: int, alpha: int, **kwargs):
    """Config expander (reference pyramidnet.py:247)."""
    layer_table = {10: [1, 1, 1, 1], 12: [2, 1, 1, 1], 14: [2, 2, 1, 1],
                   16: [2, 2, 2, 1], 18: [2, 2, 2, 2], 34: [3, 4, 6, 3],
                   50: [3, 4, 6, 3], 101: [3, 4, 23, 3],
                   152: [3, 8, 36, 3], 200: [3, 24, 36, 3]}
    if blocks not in layer_table:
        raise ValueError(f"Unsupported PyramidNet blocks: {blocks}")
    layers = layer_table[blocks]
    bottleneck = blocks >= 50
    channels = pyramidnet_channels(64, alpha, layers, bottleneck)
    return PyramidNet(channels=channels, init_block_channels=64,
                      bottleneck=bottleneck, **kwargs)


@register_model("pyramidnet101_a360")
def pyramidnet101_a360(**kwargs):
    return get_pyramidnet(blocks=101, alpha=360, **kwargs)
