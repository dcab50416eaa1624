"""EfficientNet (B0-B8, b/c TF-ported variants), TPU-native. Behavioral
reference: pytorchcv ``models/efficientnet.py`` (calc_tf_padding:27,
EffiDwsConvUnit:58, EffiInvResUnit:118, EffiInitBlock:200,
EfficientNet:243, get_efficientnet:361).

TF-SAME padding is shape-dependent in torch; here shapes are static so the
padding folds to compile-time constants (SURVEY.md §7 "calc_tf_padding
becomes compile-time padding").
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (SEBlock, Sequential, conv1x1_block, conv3x3_block,
                  dwconv3x3_block, dwconv5x5_block, global_avg_pool2d,
                  lambda_batchnorm2d, lambda_swish, round_channels)
from ..nn.base import IntPair, dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["EfficientNet", "EffiInvResUnit", "EffiInitBlock",
           "calc_tf_padding", "get_efficientnet"]


def calc_tf_padding(x, kernel_size: int, stride: int = 1,
                    dilation: int = 1):
    """TF-SAME padding from the (static) input shape
    (reference efficientnet.py:27). Returns NHWC pad spec."""
    height, width = x.shape[1:3]
    oh = math.ceil(height / stride)
    ow = math.ceil(width / stride)
    pad_h = max((oh - 1) * stride + (kernel_size - 1) * dilation + 1 -
                height, 0)
    pad_w = max((ow - 1) * stride + (kernel_size - 1) * dilation + 1 -
                width, 0)
    return ((0, 0), (pad_h // 2, pad_h - pad_h // 2),
            (pad_w // 2, pad_w - pad_w // 2), (0, 0))


class EffiDwsConvUnit(nn.Module):
    """dw 3x3 + SE + pw (reference efficientnet.py:58)."""

    out_channels: int = 0
    stride: IntPair = 1
    normalization: object = lambda_batchnorm2d()
    activation: object = lambda_swish()
    tf_mode: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        residual = (in_channels == self.out_channels) and (self.stride == 1)
        identity = x
        if self.tf_mode:
            x = jnp.pad(x, calc_tf_padding(x, kernel_size=3))
        x = dwconv3x3_block(out_channels=in_channels,
                            padding=(0 if self.tf_mode else 1),
                            normalization=self.normalization,
                            activation=self.activation, name="dw_conv")(
                                x, train=train)
        x = SEBlock(channels=in_channels, reduction=4,
                    mid_activation=self.activation, name="se")(x)
        x = conv1x1_block(out_channels=self.out_channels,
                          normalization=self.normalization, activation=None,
                          name="pw_conv")(x, train=train)
        if residual:
            x = x + identity
        return x


class EffiInvResUnit(nn.Module):
    """MBConv: exp 1x1 -> dw k -> SE -> 1x1
    (reference efficientnet.py:118)."""

    out_channels: int = 0
    kernel_size: int = 3
    stride: IntPair = 1
    exp_factor: int = 1
    se_factor: int = 4
    normalization: object = lambda_batchnorm2d()
    activation: object = lambda_swish()
    tf_mode: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        residual = (in_channels == self.out_channels) and (self.stride == 1)
        mid_channels = in_channels * self.exp_factor
        identity = x
        x = conv1x1_block(out_channels=mid_channels,
                          normalization=self.normalization,
                          activation=self.activation, name="conv1")(
                              x, train=train)
        if self.tf_mode:
            x = jnp.pad(x, calc_tf_padding(x, kernel_size=self.kernel_size,
                                           stride=self.stride))
        dw = dwconv3x3_block if self.kernel_size == 3 else dwconv5x5_block
        x = dw(out_channels=mid_channels, stride=self.stride,
               padding=(0 if self.tf_mode else self.kernel_size // 2),
               normalization=self.normalization,
               activation=self.activation, name="conv2")(x, train=train)
        if self.se_factor > 0:
            x = SEBlock(channels=mid_channels,
                        reduction=self.exp_factor * self.se_factor,
                        mid_activation=self.activation, name="se")(x)
        x = conv1x1_block(out_channels=self.out_channels,
                          normalization=self.normalization, activation=None,
                          name="conv3")(x, train=train)
        if residual:
            x = x + identity
        return x


class EffiInitBlock(nn.Module):
    """conv/2 stem with optional TF padding
    (reference efficientnet.py:200)."""

    out_channels: int = 0
    normalization: object = lambda_batchnorm2d()
    activation: object = lambda_swish()
    tf_mode: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.tf_mode:
            x = jnp.pad(x, calc_tf_padding(x, kernel_size=3, stride=2))
        return conv3x3_block(out_channels=self.out_channels, stride=2,
                             padding=(0 if self.tf_mode else 1),
                             normalization=self.normalization,
                             activation=self.activation, name="conv")(
                                 x, train=train)


class EffiOutput(nn.Module):
    """dropout + fc (reference efficientnet.py:338-343)."""

    num_classes: int = 1000
    dropout_rate: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        if train and self.dropout_rate > 0:
            x = nn.Dropout(rate=self.dropout_rate, deterministic=False,
                           name="dropout")(x)
        return nn.Dense(self.num_classes, kernel_init=dense_kernel_init,
                        name="fc")(x)


def EfficientNet(channels, init_block_channels: int,
                 final_block_channels: int, kernel_sizes, strides_per_stage,
                 expansion_factors, dropout_rate: float = 0.2,
                 tf_mode: bool = False, bn_eps: float = 1e-5,
                 in_channels: int = 3, in_size: Tuple[int, int] = (224, 224),
                 num_classes: int = 1000) -> ImageClassifier:
    """EfficientNet (reference efficientnet.py:243)."""
    normalization = lambda_batchnorm2d(eps=bn_eps)
    activation = lambda_swish()
    layers = [EffiInitBlock(out_channels=init_block_channels,
                            normalization=normalization,
                            activation=activation, tf_mode=tf_mode,
                            name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = strides_per_stage[i] if (j == 0) else 1
            if i == 0:
                units.append(EffiDwsConvUnit(
                    out_channels=out_channels, stride=stride,
                    normalization=normalization, activation=activation,
                    tf_mode=tf_mode, name=f"unit{j + 1}"))
            else:
                units.append(EffiInvResUnit(
                    out_channels=out_channels,
                    kernel_size=kernel_sizes[i][j], stride=stride,
                    exp_factor=expansion_factors[i][j], se_factor=4,
                    normalization=normalization, activation=activation,
                    tf_mode=tf_mode, name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(conv1x1_block(out_channels=final_block_channels,
                                normalization=normalization,
                                activation=activation, name="final_block"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=EffiOutput(num_classes=num_classes,
                          dropout_rate=dropout_rate, name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


_VERSIONS = {
    "b0": ((224, 224), 1.0, 1.0, 0.2), "b1": ((240, 240), 1.1, 1.0, 0.2),
    "b2": ((260, 260), 1.2, 1.1, 0.3), "b3": ((300, 300), 1.4, 1.2, 0.3),
    "b4": ((380, 380), 1.8, 1.4, 0.4), "b5": ((456, 456), 2.2, 1.6, 0.4),
    "b6": ((528, 528), 2.6, 1.8, 0.5), "b7": ((600, 600), 3.1, 2.0, 0.5),
    "b8": ((672, 672), 3.6, 2.2, 0.5),
}


def _expand(vals, layers, downsample):
    out: list = []
    for v, li, di in zip(vals, layers, downsample):
        if di != 0:
            out.append([v] * li)
        else:
            out[-1] = out[-1] + [v] * li
    return out


def get_efficientnet(version: str, in_size=None, tf_mode: bool = False,
                     bn_eps: float = 1e-5, **kwargs):
    """Config expander (reference efficientnet.py:361)."""
    if version not in _VERSIONS:
        raise ValueError(f"Unsupported EfficientNet version {version}")
    default_size, depth_factor, width_factor, dropout_rate = \
        _VERSIONS[version]
    if in_size is None:
        in_size = default_size

    init_block_channels = 32
    layers = [1, 2, 2, 3, 3, 4, 1]
    downsample = [1, 1, 1, 1, 0, 1, 0]
    channels_per_layers = [16, 24, 40, 80, 112, 192, 320]
    expansion_factors_per_layers = [1, 6, 6, 6, 6, 6, 6]
    kernel_sizes_per_layers = [3, 3, 5, 3, 5, 5, 3]
    strides_per_stage = [1, 2, 2, 2, 1, 2, 1]
    final_block_channels = 1280

    layers = [int(math.ceil(li * depth_factor)) for li in layers]
    channels_per_layers = [round_channels(ci * width_factor)
                           for ci in channels_per_layers]

    channels = _expand(channels_per_layers, layers, downsample)
    kernel_sizes = _expand(kernel_sizes_per_layers, layers, downsample)
    expansion_factors = _expand(expansion_factors_per_layers, layers,
                                downsample)
    strides = [s[0] for s in _expand(strides_per_stage, layers, downsample)]

    init_block_channels = round_channels(init_block_channels * width_factor)
    if width_factor > 1.0:
        final_block_channels = round_channels(final_block_channels *
                                              width_factor)

    return EfficientNet(channels=channels,
                        init_block_channels=init_block_channels,
                        final_block_channels=final_block_channels,
                        kernel_sizes=kernel_sizes,
                        strides_per_stage=strides,
                        expansion_factors=expansion_factors,
                        dropout_rate=dropout_rate, tf_mode=tf_mode,
                        bn_eps=bn_eps, in_size=in_size, **kwargs)


def _variant(name, version, tf_mode=False, bn_eps=1e-5):
    @register_model(name)
    def ctor(**kwargs):
        return get_efficientnet(version=version, tf_mode=tf_mode,
                                bn_eps=bn_eps, **kwargs)
    ctor.__name__ = name
    return ctor


for _v in ["b0", "b1", "b2", "b3", "b4", "b5", "b6", "b7", "b8"]:
    _variant(f"efficientnet_{_v}", _v)
for _v in ["b0", "b1", "b2", "b3", "b4", "b5", "b6", "b7"]:
    _variant(f"efficientnet_{_v}b", _v, tf_mode=True, bn_eps=1e-3)
for _v in ["b0", "b1", "b2", "b3", "b4", "b5", "b6", "b7", "b8"]:
    _variant(f"efficientnet_{_v}c", _v, tf_mode=True, bn_eps=1e-3)
