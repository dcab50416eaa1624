"""MixNet, TPU-native. Behavioral reference: pytorchcv ``models/mixnet.py``
(MixConv:15, MixConvBlock:100, mixconv1x1_block:187, MixUnit:219,
MixInitBlock:322, MixNet:357, get_mixnet:442).

MixConv splits channels into per-kernel groups; on TPU each split is an
independent conv the XLA scheduler runs back-to-back, concatenated on the
(minor-most) channel axis."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (SEBlock, Sequential, conv1x1_block, conv3x3_block,
                  dwconv3x3_block, global_avg_pool2d, round_channels)
from ..nn.activ import lambda_relu, lambda_swish
from ..nn.base import conv_kernel_init, dense_kernel_init, to_2tuple
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["MixNet", "get_mixnet"]


def _split_channels(channels, kernel_count):
    splitted = [channels // kernel_count] * kernel_count
    splitted[0] += channels - sum(splitted)
    return splitted


class MixConv(nn.Module):
    """Mixed convolution (reference mixnet.py:15)."""

    out_channels: int = 0
    kernel_size: Any = 3
    stride: int = 1
    padding: Any = 1
    dilation: int = 1
    groups: int = 1
    bias: bool = False

    @nn.compact
    def __call__(self, x):
        kernel_size = self.kernel_size if isinstance(self.kernel_size, (list, tuple)) \
            else [self.kernel_size]
        padding = self.padding if isinstance(self.padding, (list, tuple)) \
            else [self.padding]
        kernel_count = len(kernel_size)
        in_splits = _split_channels(x.shape[-1], kernel_count)
        out_splits = _split_channels(self.out_channels, kernel_count)
        xs = jnp.split(x, np_cumsum(in_splits)[:-1], axis=-1)
        outs = []
        for i, (x_i, ks_i, pd_i, oc_i) in enumerate(
                zip(xs, kernel_size, padding, out_splits)):
            groups_i = oc_i if self.out_channels == self.groups \
                else self.groups
            ph, pw = to_2tuple(pd_i)
            outs.append(nn.Conv(
                oc_i, to_2tuple(ks_i), strides=to_2tuple(self.stride),
                padding=((ph, ph), (pw, pw)),
                kernel_dilation=to_2tuple(self.dilation),
                feature_group_count=groups_i, use_bias=self.bias,
                kernel_init=conv_kernel_init, name=str(i))(x_i))
        return jnp.concatenate(outs, axis=-1)


def np_cumsum(xs):
    out, acc = [], 0
    for v in xs:
        acc += v
        out.append(acc)
    return out


class MixConvBlock(nn.Module):
    """MixConv + BN + activation (reference mixnet.py:100)."""

    out_channels: int = 0
    kernel_size: Any = 3
    stride: int = 1
    padding: Any = 1
    groups: int = 1
    activation: Any = lambda_relu()

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..nn.activ import create_activation_layer
        from ..nn.norm import BatchNorm
        x = MixConv(out_channels=self.out_channels,
                    kernel_size=self.kernel_size, stride=self.stride,
                    padding=self.padding, groups=self.groups,
                    name="conv")(x)
        x = BatchNorm(name="bn")(x, train=train)
        act = create_activation_layer(self.activation, name="activ")
        if act is not None:
            x = act(x)
        return x


def mixconv1x1_block(out_channels, kernel_count, activation, name,
                     parent=None):
    """1x1 mixed conv block (reference mixnet.py:187)."""
    return MixConvBlock(out_channels=out_channels,
                        kernel_size=[1] * kernel_count,
                        padding=[0] * kernel_count, activation=activation,
                        name=name, parent=parent)


class MixUnit(nn.Module):
    """MixNet unit (reference mixnet.py:219)."""

    out_channels: int = 0
    stride: int = 1
    exp_kernel_count: int = 1
    conv1_kernel_count: int = 1
    conv2_kernel_count: int = 1
    exp_factor: int = 1
    se_factor: int = 0
    activation: Any = lambda_relu()

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        residual = (in_channels == self.out_channels) and (self.stride == 1)
        identity = x
        mid_channels = self.exp_factor * in_channels
        if self.exp_factor > 1:
            if self.exp_kernel_count == 1:
                x = conv1x1_block(out_channels=mid_channels,
                                  activation=self.activation,
                                  name="exp_conv")(x, train=train)
            else:
                x = mixconv1x1_block(
                    mid_channels, self.exp_kernel_count, self.activation,
                    "exp_conv").clone(parent=self)(x, train=train)
        if self.conv1_kernel_count == 1:
            x = dwconv3x3_block(out_channels=mid_channels,
                                stride=self.stride,
                                activation=self.activation,
                                name="conv1")(x, train=train)
        else:
            x = MixConvBlock(
                out_channels=mid_channels,
                kernel_size=[3 + 2 * i
                             for i in range(self.conv1_kernel_count)],
                stride=self.stride,
                padding=[1 + i for i in range(self.conv1_kernel_count)],
                groups=mid_channels, activation=self.activation,
                name="conv1")(x, train=train)
        if self.se_factor > 0:
            x = SEBlock(channels=mid_channels,
                        reduction=(self.exp_factor * self.se_factor),
                        round_mid=False, mid_activation=self.activation,
                        name="se")(x, train=train)
        if self.conv2_kernel_count == 1:
            x = conv1x1_block(out_channels=self.out_channels,
                              activation=None, name="conv2")(x, train=train)
        else:
            x = mixconv1x1_block(
                self.out_channels, self.conv2_kernel_count, None,
                "conv2").clone(parent=self)(x, train=train)
        if residual:
            x = x + identity
        return x


class MixInitBlock(nn.Module):
    """Stem: strided 3x3 + MixUnit (reference mixnet.py:322)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.out_channels, stride=2,
                          name="conv1")(x, train=train)
        x = MixUnit(out_channels=self.out_channels,
                    activation=lambda_relu(),
                    name="conv2")(x, train=train)
        return x


def MixNet(channels, init_block_channels: int, final_block_channels: int,
           exp_kernel_counts, conv1_kernel_counts, conv2_kernel_counts,
           exp_factors, se_factors, in_channels: int = 3,
           in_size: Tuple[int, int] = (224, 224),
           num_classes: int = 1000) -> ImageClassifier:
    """MixNet (reference mixnet.py:357)."""
    layers = [MixInitBlock(out_channels=init_block_channels,
                           name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if ((j == 0) and (i != 3)) or \
                ((j == len(channels_per_stage) // 2) and (i == 3)) else 1
            activation = lambda_relu() if i == 0 else lambda_swish()
            units.append(MixUnit(
                out_channels=out_channels, stride=stride,
                exp_kernel_count=exp_kernel_counts[i][j],
                conv1_kernel_count=conv1_kernel_counts[i][j],
                conv2_kernel_count=conv2_kernel_counts[i][j],
                exp_factor=exp_factors[i][j], se_factor=se_factors[i][j],
                activation=activation, name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(conv1x1_block(out_channels=final_block_channels,
                                name="final_block"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_mixnet(version: str, width_scale: float, **kwargs):
    """Config expander (reference mixnet.py:442)."""
    if version == "s":
        init_block_channels = 16
        channels = [[24, 24], [40, 40, 40, 40], [80, 80, 80],
                    [120, 120, 120, 200, 200, 200]]
        exp_kernel_counts = [[2, 2], [1, 2, 2, 2], [1, 1, 1],
                             [2, 2, 2, 1, 1, 1]]
        conv1_kernel_counts = [[1, 1], [3, 2, 2, 2], [3, 2, 2],
                               [3, 4, 4, 5, 4, 4]]
        conv2_kernel_counts = [[2, 2], [1, 2, 2, 2], [2, 2, 2],
                               [2, 2, 2, 1, 2, 2]]
        exp_factors = [[6, 3], [6, 6, 6, 6], [6, 6, 6], [6, 3, 3, 6, 6, 6]]
        se_factors = [[0, 0], [2, 2, 2, 2], [4, 4, 4], [2, 2, 2, 2, 2, 2]]
    elif version == "m":
        init_block_channels = 24
        channels = [[32, 32], [40, 40, 40, 40], [80, 80, 80, 80],
                    [120, 120, 120, 120, 200, 200, 200, 200]]
        exp_kernel_counts = [[2, 2], [1, 2, 2, 2], [1, 2, 2, 2],
                             [1, 2, 2, 2, 1, 1, 1, 1]]
        conv1_kernel_counts = [[3, 1], [4, 2, 2, 2], [3, 4, 4, 4],
                               [1, 4, 4, 4, 4, 4, 4, 4]]
        conv2_kernel_counts = [[2, 2], [1, 2, 2, 2], [1, 2, 2, 2],
                               [1, 2, 2, 2, 1, 2, 2, 2]]
        exp_factors = [[6, 3], [6, 6, 6, 6], [6, 6, 6, 6],
                       [6, 3, 3, 3, 6, 6, 6, 6]]
        se_factors = [[0, 0], [2, 2, 2, 2], [4, 4, 4, 4],
                      [2, 2, 2, 2, 2, 2, 2, 2]]
    else:
        raise ValueError(f"Unsupported MixNet version {version}")
    final_block_channels = 1536
    if width_scale != 1.0:
        channels = [[round_channels(cij * width_scale) for cij in ci]
                    for ci in channels]
        init_block_channels = round_channels(init_block_channels * width_scale)
    return MixNet(channels=channels,
                  init_block_channels=init_block_channels,
                  final_block_channels=final_block_channels,
                  exp_kernel_counts=exp_kernel_counts,
                  conv1_kernel_counts=conv1_kernel_counts,
                  conv2_kernel_counts=conv2_kernel_counts,
                  exp_factors=exp_factors, se_factors=se_factors, **kwargs)


@register_model("mixnet_s")
def mixnet_s(**kwargs):
    return get_mixnet(version="s", width_scale=1.0, **kwargs)


@register_model("mixnet_m")
def mixnet_m(**kwargs):
    return get_mixnet(version="m", width_scale=1.0, **kwargs)


@register_model("mixnet_l")
def mixnet_l(**kwargs):
    return get_mixnet(version="m", width_scale=1.3, **kwargs)
