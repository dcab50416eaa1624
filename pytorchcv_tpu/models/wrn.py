"""WRN (Wide ResNet for ImageNet), TPU-native. Behavioral reference:
pytorchcv ``models/wrn.py`` (WRNConv:12, WRNBottleneck:112, WRNUnit:158,
WRNInitBlock:205, WRN:238, get_wrn:308). Biased convs, no BN.
"""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import Sequential, global_avg_pool2d, max_pool2d
from ..nn.base import IntPair, dense_kernel_init
from ..nn.conv import _conv2d
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["WRN", "WRNUnit", "get_wrn"]


class WRNConv(nn.Module):
    """biased conv + optional relu (reference wrn.py:12)."""

    out_channels: int = 0
    kernel_size: IntPair = 3
    stride: IntPair = 1
    padding: IntPair = 0
    activate: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv2d(self.out_channels, self.kernel_size, self.stride,
                    self.padding, bias=True, name="conv")(x)
        if self.activate:
            x = nn.relu(x)
        return x


class WRNBottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1, widened mid channels (reference wrn.py:112)."""

    out_channels: int = 0
    stride: IntPair = 1
    width_factor: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = int(round(self.out_channels // 4 * self.width_factor))
        x = WRNConv(out_channels=mid_channels, kernel_size=1, stride=1,
                    padding=0, activate=True, name="conv1")(x)
        x = WRNConv(out_channels=mid_channels, kernel_size=3,
                    stride=self.stride, padding=1, activate=True,
                    name="conv2")(x)
        x = WRNConv(out_channels=self.out_channels, kernel_size=1, stride=1,
                    padding=0, activate=False, name="conv3")(x)
        return x


class WRNUnit(nn.Module):
    """WRN residual unit (reference wrn.py:158)."""

    out_channels: int = 0
    stride: IntPair = 1
    width_factor: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        resize_identity = (x.shape[-1] != self.out_channels) or \
            (self.stride != 1)
        if resize_identity:
            identity = WRNConv(out_channels=self.out_channels, kernel_size=1,
                               stride=self.stride, padding=0, activate=False,
                               name="identity_conv")(x)
        else:
            identity = x
        x = WRNBottleneck(out_channels=self.out_channels, stride=self.stride,
                          width_factor=self.width_factor, name="body")(x)
        return nn.relu(x + identity)


class WRNInitBlock(nn.Module):
    """7x7/2 biased conv + relu + maxpool (reference wrn.py:205)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = WRNConv(out_channels=self.out_channels, kernel_size=7, stride=2,
                    padding=3, activate=True, name="conv")(x)
        return max_pool2d(3, 2, 1)(x)


def WRN(channels, init_block_channels: int, width_factor: float,
        in_channels: int = 3, in_size: Tuple[int, int] = (224, 224),
        num_classes: int = 1000) -> ImageClassifier:
    """WRN (reference wrn.py:238)."""
    layers = [WRNInitBlock(out_channels=init_block_channels,
                           name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(WRNUnit(out_channels=out_channels, stride=stride,
                                 width_factor=width_factor,
                                 name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_wrn(blocks: int, width_factor: float, **kwargs):
    """Config expander (reference wrn.py:308)."""
    layers_table = {50: [3, 4, 6, 3], 101: [3, 4, 23, 3],
                    152: [3, 8, 36, 3], 200: [3, 24, 36, 3]}
    if blocks not in layers_table:
        raise ValueError(f"Unsupported WRN blocks: {blocks}")
    layers = layers_table[blocks]
    channels_per_layers = [256, 512, 1024, 2048]
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    return WRN(channels=channels, init_block_channels=64,
               width_factor=width_factor, **kwargs)


@register_model("wrn50_2")
def wrn50_2(**kwargs):
    return get_wrn(blocks=50, width_factor=2.0, **kwargs)
