"""SqueezeNext, TPU-native. Behavioral reference: pytorchcv
``models/squeezenext.py`` (SqnxtUnit:10, SqnxtInitBlock:90, SqueezeNext:122,
get_squeezenext:196)."""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import (ConvBlock, Sequential, avg_pool2d, conv1x1_block,
                  conv7x7_block, max_pool2d)
from ..nn.base import dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["SqueezeNext", "get_squeezenext"]


class SqnxtUnit(nn.Module):
    """Two-stage bottleneck with asymmetric 1x3/3x1 convs
    (reference squeezenext.py:10)."""

    out_channels: int = 0
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        if self.stride == 2:
            reduction_den = 1
            resize_identity = True
        elif in_channels > self.out_channels:
            reduction_den = 4
            resize_identity = True
        else:
            reduction_den = 2
            resize_identity = False
        if resize_identity:
            identity = conv1x1_block(
                out_channels=self.out_channels, stride=self.stride,
                bias=True, name="identity_conv")(x, train=train)
        else:
            identity = x
        x = conv1x1_block(out_channels=in_channels // reduction_den,
                          stride=self.stride, bias=True,
                          name="conv1")(x, train=train)
        x = conv1x1_block(out_channels=in_channels // (2 * reduction_den),
                          bias=True, name="conv2")(x, train=train)
        x = ConvBlock(out_channels=in_channels // reduction_den,
                      kernel_size=(1, 3), padding=(0, 1), bias=True,
                      name="conv3")(x, train=train)
        x = ConvBlock(out_channels=in_channels // reduction_den,
                      kernel_size=(3, 1), padding=(1, 0), bias=True,
                      name="conv4")(x, train=train)
        x = conv1x1_block(out_channels=self.out_channels, bias=True,
                          name="conv5")(x, train=train)
        return nn.relu(x + identity)


class SqnxtInitBlock(nn.Module):
    """7x7 stride-2 (pad 1) conv + ceil-mode max pool
    (reference squeezenext.py:90)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv7x7_block(out_channels=self.out_channels, stride=2,
                          padding=1, bias=True, name="conv")(x, train=train)
        x = max_pool2d(3, 2, ceil_mode=True)(x)
        return x


def SqueezeNext(channels, init_block_channels: int,
                final_block_channels: int, in_channels: int = 3,
                in_size: Tuple[int, int] = (224, 224),
                num_classes: int = 1000) -> ImageClassifier:
    """SqueezeNext (reference squeezenext.py:122)."""
    layers = [SqnxtInitBlock(out_channels=init_block_channels,
                             name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(SqnxtUnit(out_channels=out_channels, stride=stride,
                                   name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(conv1x1_block(out_channels=final_block_channels, bias=True,
                                name="final_block"))
    layers.append(avg_pool2d(7, 1))
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_squeezenext(version: str, width_scale: float, **kwargs):
    """Config expander (reference squeezenext.py:196)."""
    init_block_channels = 64
    final_block_channels = 128
    channels_per_layers = [32, 64, 128, 256]
    if version == "23":
        layers = [6, 6, 8, 1]
    elif version == "23v5":
        layers = [2, 4, 14, 1]
    else:
        raise ValueError(f"Unsupported SqueezeNext version {version}")
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    if width_scale != 1:
        channels = [[int(cij * width_scale) for cij in ci] for ci in channels]
        init_block_channels = int(init_block_channels * width_scale)
        final_block_channels = int(final_block_channels * width_scale)
    return SqueezeNext(channels=channels,
                       init_block_channels=init_block_channels,
                       final_block_channels=final_block_channels, **kwargs)


for _v, _ws, _name in [("23", 1.0, "sqnxt23_w1"), ("23", 1.5, "sqnxt23_w3d2"),
                       ("23", 2.0, "sqnxt23_w2"), ("23v5", 1.0, "sqnxt23v5_w1"),
                       ("23v5", 1.5, "sqnxt23v5_w3d2"),
                       ("23v5", 2.0, "sqnxt23v5_w2")]:
    def _make(version=_v, width_scale=_ws):
        def ctor(**kwargs):
            return get_squeezenext(version=version, width_scale=width_scale,
                                   **kwargs)
        return ctor
    _ctor = _make()
    _ctor.__name__ = _name
    register_model(_name)(_ctor)
