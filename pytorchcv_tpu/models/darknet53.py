"""DarkNet-53, TPU-native. Behavioral reference: pytorchcv
``models/darknet53.py`` (DarkUnit:15, DarkNet53:52, get_darknet53:~145)."""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import (Sequential, conv1x1_block, conv3x3_block,
                  global_avg_pool2d, lambda_leakyrelu)
from ..nn.base import dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["DarkNet53", "DarkUnit", "get_darknet53"]


class DarkUnit(nn.Module):
    """1x1 half-width -> 3x3 + residual (reference darknet53.py:15)."""

    out_channels: int = 0
    alpha: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        activation = lambda_leakyrelu(negative_slope=self.alpha)
        mid_channels = self.out_channels // 2
        identity = x
        x = conv1x1_block(out_channels=mid_channels, activation=activation,
                          name="conv1")(x, train=train)
        x = conv3x3_block(out_channels=self.out_channels,
                          activation=activation, name="conv2")(x, train=train)
        return x + identity


def DarkNet53(channels, init_block_channels: int, alpha: float = 0.1,
              in_channels: int = 3, in_size: Tuple[int, int] = (224, 224),
              num_classes: int = 1000) -> ImageClassifier:
    """DarkNet-53 (reference darknet53.py:52)."""
    activation = lambda_leakyrelu(negative_slope=alpha)
    layers = [conv3x3_block(out_channels=init_block_channels,
                            activation=activation, name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            if j == 0:
                units.append(conv3x3_block(
                    out_channels=out_channels, stride=2,
                    activation=activation, name=f"unit{j + 1}"))
            else:
                units.append(DarkUnit(out_channels=out_channels, alpha=alpha,
                                      name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_darknet53(**kwargs):
    """Config expander (reference darknet53.py:~145)."""
    init_block_channels = 32
    layers = [2, 3, 9, 9, 5]
    channels_per_layers = [64, 128, 256, 512, 1024]
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    return DarkNet53(channels=channels,
                     init_block_channels=init_block_channels, **kwargs)


@register_model("darknet53")
def darknet53(**kwargs):
    return get_darknet53(**kwargs)
