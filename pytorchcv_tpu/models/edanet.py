"""EDANet, TPU-native. Behavioral reference: pytorchcv ``models/edanet.py``
(DownBlock:15, EDABlock:63, EDAUnit:115, EDANet:170, get_edanet:248)."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (AsymConvBlock, InterpolationBlock, NormActivation,
                  Sequential, conv1x1, conv1x1_block, conv3x3, max_pool2d)
from ..nn.base import Composed
from ..nn.norm import lambda_batchnorm2d
from .registry import register_model

__all__ = ["EDANet", "get_edanet"]


class EDADownBlock(nn.Module):
    """EDANet downsample block (reference edanet.py:15)."""

    out_channels: int = 0
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        expand = in_channels < self.out_channels
        mid_channels = self.out_channels - in_channels if expand \
            else self.out_channels
        y = conv3x3(out_channels=mid_channels, bias=True, stride=2,
                    name="conv")(x)
        if expand:
            z = max_pool2d(2, 2)(x)
            y = jnp.concatenate([y, z], axis=-1)
        return NormActivation(
            normalization=lambda_batchnorm2d(eps=self.bn_eps),
            name="norm_activ")(y, train=train)


class EDAUnit(nn.Module):
    """EDANet dense unit (reference edanet.py:115)."""

    out_channels: int = 0
    dilation: int = 1
    dropout_rate: float = 0.0
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        nm = lambda_batchnorm2d(eps=self.bn_eps)
        mid_channels = self.out_channels - x.shape[-1]
        x = conv1x1_block(out_channels=mid_channels, bias=True,
                          name="conv1")(x, train=train)
        # EDABlock (reference edanet.py:63), children conv1/conv2 under conv2
        x = Sequential(layers=(
            AsymConvBlock(channels=mid_channels, kernel_size=3, padding=1,
                          bias=True, lw_use_bn=False, normalization=nm,
                          lw_activation=None, name="conv1", parent=None),
            AsymConvBlock(channels=mid_channels, kernel_size=3,
                          padding=self.dilation, dilation=self.dilation,
                          bias=True, lw_use_bn=False, normalization=nm,
                          rw_activation=None, name="conv2", parent=None),
        ), name="conv2")(x, train=train)
        if self.dropout_rate != 0.0:
            x = nn.Dropout(rate=self.dropout_rate,
                           deterministic=not train)(x)
        x = jnp.concatenate([x, identity], axis=-1)
        return nn.relu(x)


class EDANet(Composed):
    """EDANet (reference edanet.py:170)."""

    channels: Any = None
    dilations: Any = None
    growth_rate: int = 40
    bn_eps: float = 1e-5
    aux: bool = False
    fixed_size: bool = False
    in_size: Tuple[int, int] = (1024, 2048)
    in_channels: int = 3
    num_classes: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = self.in_channels
        dropout_rate = 0.02
        stages = []
        for i, dilations_per_stage in enumerate(self.dilations):
            out_channels = self.channels[i]
            units = []
            for j, dilation in enumerate(dilations_per_stage):
                if j == 0:
                    units.append(EDADownBlock(
                        out_channels=out_channels, bn_eps=self.bn_eps,
                        name="unit1", parent=None))
                else:
                    out_channels += self.growth_rate
                    units.append(EDAUnit(
                        out_channels=out_channels, dilation=dilation,
                        dropout_rate=dropout_rate, bn_eps=self.bn_eps,
                        name=f"unit{j + 1}", parent=None))
                in_channels = out_channels
            stages.append(Sequential(layers=tuple(units),
                                     name=f"stage{i + 1}", parent=None))
        x = Sequential(layers=tuple(stages), name="features")(x, train=train)
        x = conv1x1(out_channels=self.num_classes, bias=True, name="head")(x)
        return InterpolationBlock(scale_factor=8, align_corners=True)(
            x, size=(8 * x.shape[1], 8 * x.shape[2]))


def get_edanet(**kwargs):
    """Config expander (reference edanet.py:248)."""
    channels = [15, 60, 130, 450]
    dilations = [[0], [0, 1, 1, 1, 2, 2], [0, 2, 2, 4, 4, 8, 8, 16, 16]]
    growth_rate = 40
    return EDANet(channels=channels, dilations=dilations,
                  growth_rate=growth_rate, bn_eps=kwargs.pop("bn_eps", 1e-3), **kwargs)


@register_model("edanet_cityscapes")
def edanet_cityscapes(num_classes: int = 19, **kwargs):
    return get_edanet(num_classes=num_classes, **kwargs)
