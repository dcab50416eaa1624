"""LEDNet, TPU-native. Behavioral reference: pytorchcv ``models/lednet.py``
(LEDBranch:16, LEDUnit:64, PoolingBranch:125, APN:178, LEDNet:272,
get_lednet:360)."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (AsymConvBlock, BreakBlock, ChannelShuffle, Hourglass,
                  InterpolationBlock, Sequential, adaptive_avg_pool2d,
                  conv1x1_block, conv3x3_block, conv5x5_block,
                  conv7x7_block)
from ..nn.base import Composed
from ..nn.norm import lambda_batchnorm2d
from .enet import ENetMixDownBlock
from .registry import register_model

__all__ = ["LEDNet", "get_lednet"]


class LEDBranch(nn.Module):
    """Asym conv pair branch (reference lednet.py:16)."""

    channels: int = 0
    dilation: int = 1
    dropout_rate: float = 0.0
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        nm = lambda_batchnorm2d(eps=self.bn_eps)
        x = AsymConvBlock(channels=self.channels, kernel_size=3, padding=1,
                          bias=True, lw_use_bn=False, normalization=nm,
                          name="conv1")(x, train=train)
        x = AsymConvBlock(channels=self.channels, kernel_size=3,
                          padding=self.dilation, dilation=self.dilation,
                          bias=True, lw_use_bn=False, normalization=nm,
                          rw_activation=None, name="conv2")(x, train=train)
        if self.dropout_rate != 0.0:
            x = nn.Dropout(rate=self.dropout_rate,
                           deterministic=not train)(x)
        return x


class LEDUnit(nn.Module):
    """Split-Shuffle-non-bottleneck unit (reference lednet.py:64)."""

    channels: int = 0
    dilation: int = 1
    dropout_rate: float = 0.0
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        mid = self.channels // 2
        x1, x2 = jnp.split(x, 2, axis=-1)
        x1 = LEDBranch(channels=mid, dilation=self.dilation,
                       dropout_rate=self.dropout_rate, bn_eps=self.bn_eps,
                       name="left_branch")(x1, train=train)
        x2 = LEDBranch(channels=mid, dilation=self.dilation,
                       dropout_rate=self.dropout_rate, bn_eps=self.bn_eps,
                       name="right_branch")(x2, train=train)
        x = jnp.concatenate([x1, x2], axis=-1)
        x = nn.relu(x + identity)
        return ChannelShuffle(groups=2)(x)


class PoolingBranch(nn.Module):
    """Global pooling branch (reference lednet.py:125)."""

    out_channels: int = 0
    bias: bool = True
    bn_eps: float = 1e-5
    down_size: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_size = x.shape[1:3]
        y = adaptive_avg_pool2d(self.down_size)(x)
        y = conv1x1_block(out_channels=self.out_channels, bias=self.bias,
                          normalization=lambda_batchnorm2d(eps=self.bn_eps),
                          name="conv")(y, train=train)
        return InterpolationBlock()(y, size=in_size)


class APN(nn.Module):
    """Attention pyramid network block (reference lednet.py:178)."""

    out_channels: int = 0
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        nm = lambda_batchnorm2d(eps=self.bn_eps)
        att = 1
        y = PoolingBranch(out_channels=self.out_channels, bias=True,
                          bn_eps=self.bn_eps, down_size=1,
                          name="pool_branch")(x, train=train)
        down_seq = (
            conv7x7_block(out_channels=att, stride=2, bias=True,
                          normalization=nm, name="down1", parent=None),
            conv5x5_block(out_channels=att, stride=2, bias=True,
                          normalization=nm, name="down2", parent=None),
            Sequential(layers=(
                conv3x3_block(out_channels=att, stride=2, bias=True,
                              normalization=nm, name="conv1", parent=None),
                conv3x3_block(out_channels=att, bias=True,
                              normalization=nm, name="conv2", parent=None),
            ), name="down3", parent=None),
        )
        up_seq = tuple(InterpolationBlock(scale_factor=2,
                                          name=f"up{i + 1}", parent=None)
                       for i in range(3))
        skip_seq = (
            BreakBlock(),
            conv7x7_block(out_channels=att, bias=True, normalization=nm,
                          name="skip2", parent=None),
            conv5x5_block(out_channels=att, bias=True, normalization=nm,
                          name="skip3", parent=None),
        )
        w = Hourglass(down_seq=down_seq, up_seq=up_seq, skip_seq=skip_seq,
                      name="hg")(x, train=train)
        x = conv1x1_block(out_channels=self.out_channels, bias=True,
                          normalization=nm, name="body")(x, train=train)
        x = x * w
        return x + y


class LEDNet(Composed):
    """LEDNet (reference lednet.py:272)."""

    channels: Any = None
    dilations: Any = None
    dropout_rates: Any = None
    correct_size_mismatch: bool = False
    bn_eps: float = 1e-5
    aux: bool = False
    fixed_size: bool = False
    in_size: Tuple[int, int] = (1024, 2048)
    in_channels: int = 3
    num_classes: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = self.in_channels
        stages = []
        for i, dilations_per_stage in enumerate(self.dilations):
            out_channels = self.channels[i]
            units = []
            for j, dilation in enumerate(dilations_per_stage):
                if j == 0:
                    units.append(ENetMixDownBlock(
                        out_channels=out_channels, bias=True,
                        bn_eps=self.bn_eps,
                        correct_size_mismatch=self.correct_size_mismatch,
                        name="unit1", parent=None))
                    in_channels = out_channels
                else:
                    units.append(LEDUnit(
                        channels=in_channels, dilation=dilation,
                        dropout_rate=self.dropout_rates[i],
                        bn_eps=self.bn_eps, name=f"unit{j + 1}",
                        parent=None))
            stages.append(Sequential(layers=tuple(units),
                                     name=f"stage{i + 1}", parent=None))
        x = Sequential(layers=tuple(stages), name="encoder")(x, train=train)
        x = APN(out_channels=self.num_classes, bn_eps=self.bn_eps,
                name="apn")(x, train=train)
        return InterpolationBlock(scale_factor=8, align_corners=True)(
            x, size=(8 * x.shape[1], 8 * x.shape[2]))


def get_lednet(**kwargs):
    """Config expander (reference lednet.py:360)."""
    channels = [32, 64, 128]
    dilations = [[0, 1, 1, 1], [0, 1, 1], [0, 1, 2, 5, 9, 2, 5, 9, 17]]
    dropout_rates = [0.03, 0.03, 0.3]
    return LEDNet(channels=channels, dilations=dilations,
                  dropout_rates=dropout_rates, bn_eps=kwargs.pop("bn_eps", 1e-3), **kwargs)


@register_model("lednet_cityscapes")
def lednet_cityscapes(num_classes: int = 19, **kwargs):
    return get_lednet(num_classes=num_classes, **kwargs)
