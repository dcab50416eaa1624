"""MobileNetV2, TPU-native. Behavioral reference: pytorchcv
``models/mobilenetv2.py`` (LinearBottleneck:16, MobileNetV2:74,
get_mobilenetv2:159). Inverted residuals with ReLU6; the classifier is a
1x1 conv applied to the pooled feature (bias-free).
"""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import (Sequential, conv1x1, conv1x1_block, conv3x3_block,
                  dwconv3x3_block, global_avg_pool2d, lambda_relu6)
from ..nn.base import IntPair
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["MobileNetV2", "LinearBottleneck", "get_mobilenetv2"]


class LinearBottleneck(nn.Module):
    """expand 1x1 -> dw 3x3 -> project 1x1 (no act); residual when shapes
    allow (reference mobilenetv2.py:16)."""

    out_channels: int = 0
    stride: IntPair = 1
    expansion: bool = True
    remove_exp_conv: bool = False
    activation: object = lambda_relu6()

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        residual = (in_channels == self.out_channels) and (self.stride == 1)
        mid_channels = in_channels * 6 if self.expansion else in_channels
        use_exp_conv = self.expansion or (not self.remove_exp_conv)
        identity = x
        if use_exp_conv:
            x = conv1x1_block(out_channels=mid_channels,
                              activation=self.activation,
                              name="conv1")(x, train=train)
        x = dwconv3x3_block(out_channels=mid_channels, stride=self.stride,
                            activation=self.activation,
                            name="conv2")(x, train=train)
        x = conv1x1_block(out_channels=self.out_channels, activation=None,
                          name="conv3")(x, train=train)
        if residual:
            x = x + identity
        return x


def MobileNetV2(channels, init_block_channels: int,
                final_block_channels: int, remove_exp_conv: bool,
                in_channels: int = 3, in_size: Tuple[int, int] = (224, 224),
                num_classes: int = 1000) -> ImageClassifier:
    """MobileNetV2 (reference mobilenetv2.py:74)."""
    activation = lambda_relu6()
    layers = [conv3x3_block(out_channels=init_block_channels, stride=2,
                            activation=activation, name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            expansion = (i != 0) or (j != 0)
            units.append(LinearBottleneck(
                out_channels=out_channels, stride=stride, expansion=expansion,
                remove_exp_conv=remove_exp_conv, activation=activation,
                name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(conv1x1_block(out_channels=final_block_channels,
                                activation=activation, name="final_block"))
    layers.append(global_avg_pool2d(keepdims=True))
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=conv1x1(out_channels=num_classes, bias=False, name="output"),
        output_before_flatten=True,
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_mobilenetv2(width_scale: float, remove_exp_conv: bool = False,
                    **kwargs):
    """Config expander (reference mobilenetv2.py:159)."""
    init_block_channels = 32
    final_block_channels = 1280
    layers = [1, 2, 3, 4, 3, 3, 1]
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
        channels = [[int(cij * width_scale) for cij in ci] for ci in channels]
        init_block_channels = int(init_block_channels * width_scale)
        if width_scale > 1.0:
            final_block_channels = int(final_block_channels * width_scale)

    return MobileNetV2(channels=channels,
                       init_block_channels=init_block_channels,
                       final_block_channels=final_block_channels,
                       remove_exp_conv=remove_exp_conv, **kwargs)


def _variant(name, **cfg):
    @register_model(name)
    def ctor(**kwargs):
        return get_mobilenetv2(**cfg, **kwargs)
    ctor.__name__ = name
    return ctor


mobilenetv2_w1 = _variant("mobilenetv2_w1", width_scale=1.0)
mobilenetv2_w3d4 = _variant("mobilenetv2_w3d4", width_scale=0.75)
mobilenetv2_wd2 = _variant("mobilenetv2_wd2", width_scale=0.5)
mobilenetv2_wd4 = _variant("mobilenetv2_wd4", width_scale=0.25)
mobilenetv2b_w1 = _variant("mobilenetv2b_w1", width_scale=1.0,
                           remove_exp_conv=True)
mobilenetv2b_w3d4 = _variant("mobilenetv2b_w3d4", width_scale=0.75,
                             remove_exp_conv=True)
mobilenetv2b_wd2 = _variant("mobilenetv2b_wd2", width_scale=0.5,
                            remove_exp_conv=True)
mobilenetv2b_wd4 = _variant("mobilenetv2b_wd4", width_scale=0.25,
                            remove_exp_conv=True)
