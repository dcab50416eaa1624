"""CBAM-ResNet, TPU-native. Behavioral reference: pytorchcv
``models/cbamresnet.py`` (MLP:15, ChannelGate:48, SpatialGate:83,
CbamBlock:105, CbamResUnit:130, CbamResNet:185). The channel-gate MLP is
shared between avg- and max-pool paths (single parameter set).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import (Sequential, conv1x1_block, conv7x7_block,
                  global_avg_pool2d)
from ..nn.base import IntPair, dense_kernel_init
from .registry import register_model
from .resnet import ResBlock, ResBottleneck, ResInitBlock
from .shell import ImageClassifier

__all__ = ["CbamResNet", "CbamResUnit", "get_cbam_resnet"]


class MLP(nn.Module):
    """flatten -> fc1 -> relu -> fc2 (reference cbamresnet.py:15)."""

    channels: int = 0
    reduction_ratio: int = 16

    @nn.compact
    def __call__(self, x):
        mid_channels = self.channels // self.reduction_ratio
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(mid_channels, kernel_init=dense_kernel_init,
                     name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.channels, kernel_init=dense_kernel_init,
                        name="fc2")(x)


class ChannelGate(nn.Module):
    """Shared-MLP channel attention (reference cbamresnet.py:48)."""

    channels: int = 0
    reduction_ratio: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        mlp = MLP(channels=self.channels,
                  reduction_ratio=self.reduction_ratio, name="mlp")
        att1 = mlp(jnp.mean(x, axis=(1, 2), keepdims=True))
        att2 = mlp(jnp.max(x, axis=(1, 2), keepdims=True))
        att = jax.nn.sigmoid(att1 + att2)
        return x * att[:, None, None, :]


class SpatialGate(nn.Module):
    """(channel-max | channel-mean) -> 7x7 conv block -> sigmoid gate
    (reference cbamresnet.py:83)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        att1 = jnp.max(x, axis=-1, keepdims=True)
        att2 = jnp.mean(x, axis=-1, keepdims=True)
        att = jnp.concatenate([att1, att2], axis=-1)
        att = conv7x7_block(out_channels=1, activation=None, name="conv")(
            att, train=train)
        return x * jax.nn.sigmoid(att)


class CbamBlock(nn.Module):
    """channel gate then spatial gate (reference cbamresnet.py:105)."""

    channels: int = 0
    reduction_ratio: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ChannelGate(channels=self.channels,
                        reduction_ratio=self.reduction_ratio,
                        name="ch_gate")(x, train=train)
        return SpatialGate(name="sp_gate")(x, train=train)


class CbamResUnit(nn.Module):
    """ResNet unit + CBAM before the residual add
    (reference cbamresnet.py:130)."""

    out_channels: int = 0
    stride: IntPair = 1
    bottleneck: bool = True

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
        if self.bottleneck:
            x = ResBottleneck(out_channels=self.out_channels,
                              stride=self.stride, conv1_stride=False,
                              name="body")(x, train=train)
        else:
            x = ResBlock(out_channels=self.out_channels, stride=self.stride,
                         name="body")(x, train=train)
        x = CbamBlock(channels=self.out_channels, name="cbam")(
            x, train=train)
        return nn.relu(x + identity)


def CbamResNet(channels, init_block_channels: int, bottleneck: bool,
               in_channels: int = 3, in_size: Tuple[int, int] = (224, 224),
               num_classes: int = 1000) -> ImageClassifier:
    """CBAM-ResNet (reference cbamresnet.py:185)."""
    layers = [ResInitBlock(out_channels=init_block_channels,
                           name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(CbamResUnit(out_channels=out_channels,
                                     stride=stride, bottleneck=bottleneck,
                                     name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_cbam_resnet(blocks: int, **kwargs):
    """Config expander (reference cbamresnet.py:~240)."""
    table = {18: ([2, 2, 2, 2], False), 34: ([3, 4, 6, 3], False),
             50: ([3, 4, 6, 3], True), 101: ([3, 4, 23, 3], True),
             152: ([3, 8, 36, 3], True)}
    if blocks not in table:
        raise ValueError(f"Unsupported CBAM-ResNet blocks: {blocks}")
    layers, bottleneck = table[blocks]
    channels_per_layers = [64, 128, 256, 512]
    if bottleneck:
        channels_per_layers = [ci * 4 for ci in channels_per_layers]
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    return CbamResNet(channels=channels, init_block_channels=64,
                      bottleneck=bottleneck, **kwargs)


def _variant(name, blocks):
    @register_model(name)
    def ctor(**kwargs):
        return get_cbam_resnet(blocks=blocks, **kwargs)
    ctor.__name__ = name
    return ctor


cbam_resnet18 = _variant("cbam_resnet18", 18)
cbam_resnet34 = _variant("cbam_resnet34", 34)
cbam_resnet50 = _variant("cbam_resnet50", 50)
cbam_resnet101 = _variant("cbam_resnet101", 101)
cbam_resnet152 = _variant("cbam_resnet152", 152)
