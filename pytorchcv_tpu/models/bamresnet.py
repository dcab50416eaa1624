"""BAM-ResNet, TPU-native. Behavioral reference: pytorchcv
``models/bamresnet.py`` (DenseBlock:12, ChannelGate:44, SpatialGate:95,
BamBlock:156, BamResUnit:183, BamResNet:228, get_resnet:299)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (DenseBlock, Sequential, conv1x1, conv1x1_block,
                  conv3x3_block, global_avg_pool2d)
from ..nn.base import dense_kernel_init
from .registry import register_model
from .resnet import ResInitBlock, ResUnit
from .shell import ImageClassifier

__all__ = ["BamResNet", "get_bamresnet"]


class ChannelGate(nn.Module):
    """BAM channel gate (reference bamresnet.py:44)."""

    channels: int = 0
    reduction_ratio: int = 16
    num_layers: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x
        mid_channels = self.channels // self.reduction_ratio
        x = x.mean(axis=(1, 2))
        x = DenseBlock(out_features=mid_channels, bias=True,
                       name="init_fc")(x, train=train)
        for i in range(self.num_layers - 1):
            x = DenseBlock(out_features=mid_channels, bias=True,
                           name=f"main_fcs_fc{i + 1}")(x, train=train)
        x = nn.Dense(self.channels, kernel_init=dense_kernel_init,
                     name="final_fc")(x)
        return jnp.broadcast_to(x[:, None, None, :], inp.shape)


class SpatialGate(nn.Module):
    """BAM spatial gate (reference bamresnet.py:95)."""

    channels: int = 0
    reduction_ratio: int = 16
    num_dil_convs: int = 2
    dilation: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x
        mid_channels = self.channels // self.reduction_ratio
        x = conv1x1_block(out_channels=mid_channels, bias=True,
                          name="init_conv")(x, train=train)
        convs = [conv3x3_block(out_channels=mid_channels,
                               padding=self.dilation, dilation=self.dilation,
                               bias=True, name=f"conv{i + 1}", parent=None)
                 for i in range(self.num_dil_convs)]
        x = Sequential(layers=tuple(convs), name="dil_convs")(x, train=train)
        x = conv1x1(out_channels=1, bias=True, name="final_conv")(x)
        return jnp.broadcast_to(x, inp.shape)


class BamBlock(nn.Module):
    """BAM attention: x * (1 + sigmoid(ch_att * sp_att))
    (reference bamresnet.py:156)."""

    channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = ChannelGate(channels=self.channels, name="ch_att")(
            x, train=train)
        sp = SpatialGate(channels=self.channels, name="sp_att")(
            x, train=train)
        att = 1 + nn.sigmoid(ch * sp)
        return x * att


class BamResUnit(nn.Module):
    """BAM before the stride-2 ResUnit (reference bamresnet.py:183)."""

    out_channels: int = 0
    stride: int = 1
    bottleneck: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stride != 1:
            x = BamBlock(channels=x.shape[-1], name="bam")(x, train=train)
        return ResUnit(out_channels=self.out_channels, stride=self.stride,
                       bottleneck=self.bottleneck, conv1_stride=False,
                       name="res_unit")(x, train=train)


def BamResNet(channels, init_block_channels: int, bottleneck: bool,
              in_channels: int = 3, in_size: Tuple[int, int] = (224, 224),
              num_classes: int = 1000) -> ImageClassifier:
    """BAM-ResNet (reference bamresnet.py:228)."""
    layers = [ResInitBlock(out_channels=init_block_channels,
                           name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(BamResUnit(out_channels=out_channels, stride=stride,
                                    bottleneck=bottleneck,
                                    name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_bamresnet(blocks: int, **kwargs):
    """Config expander (reference bamresnet.py:299)."""
    table = {18: [2, 2, 2, 2], 34: [3, 4, 6, 3], 50: [3, 4, 6, 3],
             101: [3, 4, 23, 3], 152: [3, 8, 36, 3]}
    if blocks not in table:
        raise ValueError(f"Unsupported BAM-ResNet blocks: {blocks}")
    layers = table[blocks]
    if blocks < 50:
        channels_per_layers = [64, 128, 256, 512]
        bottleneck = False
    else:
        channels_per_layers = [256, 512, 1024, 2048]
        bottleneck = True
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    return BamResNet(channels=channels, init_block_channels=64,
                     bottleneck=bottleneck, **kwargs)


for _b in (18, 34, 50, 101, 152):
    _name = f"bam_resnet{_b}"

    def _make(blocks=_b):
        def ctor(**kwargs):
            return get_bamresnet(blocks=blocks, **kwargs)
        return ctor
    _ctor = _make()
    _ctor.__name__ = _name
    register_model(_name)(_ctor)
