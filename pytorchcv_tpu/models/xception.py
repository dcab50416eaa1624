"""Xception, TPU-native. Behavioral reference: pytorchcv
``models/xception.py`` (DwsConv:10, DwsConvBlock:55, XceptionUnit:118,
XceptionInitBlock:192, XceptionFinalBlock:219, Xception:248,
get_xception:307)."""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import (BatchNorm, Sequential, conv1x1_block, conv3x3_block,
                  global_avg_pool2d, max_pool2d)
from ..nn.base import conv_kernel_init, dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["Xception", "get_xception"]


class XDwsConv(nn.Module):
    """dw conv -> pw conv (reference xception.py:10)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        x = nn.Conv(in_channels, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=in_channels, use_bias=False,
                    kernel_init=conv_kernel_init, name="dw_conv")(x)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    kernel_init=conv_kernel_init, name="pw_conv")(x)
        return x


class XDwsConvBlock(nn.Module):
    """[ReLU ->] dws conv -> BN (reference xception.py:55).
    Pre-activation variant private to Xception."""

    out_channels: int = 0
    activate: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.activate:
            x = nn.relu(x)
        x = XDwsConv(out_channels=self.out_channels, name="conv")(x)
        x = BatchNorm(name="bn")(x, train=train)
        return x


class XceptionUnit(nn.Module):
    """Residual unit of pre-activated dws blocks (reference xception.py:118)."""

    in_channels: int = 0
    out_channels: int = 0
    stride: int = 1
    reps: int = 2
    start_with_relu: bool = True
    grow_first: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        resize_identity = (self.in_channels != self.out_channels) or \
            (self.stride != 1)
        if resize_identity:
            identity = conv1x1_block(
                out_channels=self.out_channels, stride=self.stride,
                activation=None, name="identity_conv")(x, train=train)
        else:
            identity = x
        blocks = []
        for i in range(self.reps):
            if (self.grow_first and i == 0) or \
                    (not self.grow_first and i == self.reps - 1):
                out_channels_i = self.out_channels
            else:
                out_channels_i = (self.out_channels if self.grow_first
                                  else self.in_channels)
            activate = self.start_with_relu if i == 0 else True
            blocks.append(XDwsConvBlock(out_channels=out_channels_i,
                                        activate=activate,
                                        name=f"block{i + 1}", parent=None))
        if self.stride != 1:
            blocks.append(max_pool2d(3, self.stride, padding=1))
        x = Sequential(layers=tuple(blocks), name="body")(x, train=train)
        return x + identity


class XceptionInitBlock(nn.Module):
    """Two unpadded 3x3 blocks, first stride 2 (reference xception.py:192)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=32, stride=2, padding=0,
                          name="conv1")(x, train=train)
        x = conv3x3_block(out_channels=64, padding=0,
                          name="conv2")(x, train=train)
        return x


class XceptionFinalBlock(nn.Module):
    """Two dws blocks + ReLU + pool (reference xception.py:219)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = XDwsConvBlock(out_channels=1536, activate=False,
                          name="conv1")(x, train=train)
        x = XDwsConvBlock(out_channels=2048, activate=True,
                          name="conv2")(x, train=train)
        x = nn.relu(x)
        return global_avg_pool2d()(x)


def Xception(channels, in_channels: int = 3,
             in_size: Tuple[int, int] = (299, 299),
             num_classes: int = 1000) -> ImageClassifier:
    """Xception (reference xception.py:248)."""
    layers = [XceptionInitBlock(name="init_block")]
    cur_channels = 64
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            units.append(XceptionUnit(
                in_channels=cur_channels, out_channels=out_channels,
                stride=(2 if j == 0 else 1), reps=(2 if j == 0 else 3),
                start_with_relu=((i != 0) or (j != 0)),
                grow_first=((i != len(channels) - 1) or
                            (j != len(channels_per_stage) - 1)),
                name=f"unit{j + 1}"))
            cur_channels = out_channels
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(XceptionFinalBlock(name="final_block"))
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_xception(**kwargs):
    """Config expander (reference xception.py:307)."""
    channels = [[128], [256], [728] * 9, [1024]]
    return Xception(channels=channels, **kwargs)


@register_model("xception")
def xception(**kwargs):
    return get_xception(**kwargs)
