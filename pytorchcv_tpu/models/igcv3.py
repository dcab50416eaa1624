"""IGCV3, TPU-native. Behavioral reference: pytorchcv ``models/igcv3.py``
(InvResUnit:17, IGCV3:78, get_igcv3:157). Interleaved group 1x1 convs with
channel shuffle in MobileNetV2-style inverted residuals."""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import (ChannelShuffle, Sequential, channel_shuffle, conv1x1_block,
                  conv3x3_block, dwconv3x3_block, global_avg_pool2d,
                  lambda_relu6)
from ..nn.base import IntPair, dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["IGCV3", "get_igcv3"]


class InvResUnit(nn.Module):
    """grouped 1x1 -> shuffle -> dw3x3 -> grouped 1x1
    (reference igcv3.py:17)."""

    out_channels: int = 0
    stride: IntPair = 1
    expansion: bool = True
    activation: object = lambda_relu6()

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        residual = (in_channels == self.out_channels) and (self.stride == 1)
        mid_channels = in_channels * 6 if self.expansion else in_channels
        groups = 2
        identity = x
        x = conv1x1_block(out_channels=mid_channels, groups=groups,
                          activation=None, name="conv1")(x, train=train)
        x = channel_shuffle(x, groups)
        x = dwconv3x3_block(out_channels=mid_channels, stride=self.stride,
                            activation=self.activation, name="conv2")(
                                x, train=train)
        x = conv1x1_block(out_channels=self.out_channels, groups=groups,
                          activation=None, name="conv3")(x, train=train)
        if residual:
            x = x + identity
        return x


def IGCV3(channels, init_block_channels: int, final_block_channels: int,
          in_channels: int = 3, in_size: Tuple[int, int] = (224, 224),
          num_classes: int = 1000) -> ImageClassifier:
    """IGCV3 (reference igcv3.py:78)."""
    activation = lambda_relu6()
    layers = [conv3x3_block(out_channels=init_block_channels, stride=2,
                            activation=activation, name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            expansion = (i != 0) or (j != 0)
            units.append(InvResUnit(out_channels=out_channels, stride=stride,
                                    expansion=expansion,
                                    activation=activation,
                                    name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(conv1x1_block(out_channels=final_block_channels,
                                activation=activation, name="final_block"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_igcv3(width_scale: float, **kwargs):
    """Config expander (reference igcv3.py:157)."""
    init_block_channels = 32
    final_block_channels = 1280
    layers = [1, 4, 6, 8, 6, 6, 1]
    downsample = [0, 1, 1, 1, 0, 1, 0]
    channels_per_layers = [16, 24, 32, 64, 96, 160, 320]

    channels: list = [[]]
    for ci, li, di in zip(channels_per_layers, layers, downsample):
        if di != 0:
            channels.append([ci] * li)
        else:
            channels[-1] = channels[-1] + [ci] * li
    channels = [c for c in channels if c]

    if width_scale != 1.0:
        def make_even(x):
            return x if (x % 2 == 0) else x + 1
        channels = [[make_even(int(cij * width_scale)) for cij in ci]
                    for ci in channels]
        init_block_channels = make_even(int(init_block_channels *
                                            width_scale))
        if width_scale > 1.0:
            final_block_channels = make_even(int(final_block_channels *
                                                 width_scale))

    return IGCV3(channels=channels,
                 init_block_channels=init_block_channels,
                 final_block_channels=final_block_channels, **kwargs)


def _variant(name, width_scale):
    @register_model(name)
    def ctor(**kwargs):
        return get_igcv3(width_scale=width_scale, **kwargs)
    ctor.__name__ = name
    return ctor


igcv3_w1 = _variant("igcv3_w1", 1.0)
igcv3_w3d4 = _variant("igcv3_w3d4", 0.75)
igcv3_wd2 = _variant("igcv3_wd2", 0.5)
igcv3_wd4 = _variant("igcv3_wd4", 0.25)
