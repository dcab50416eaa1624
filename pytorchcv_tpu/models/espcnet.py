"""ESPNet-C, TPU-native. Behavioral reference: pytorchcv
``models/espcnet.py`` (HierarchicalConcurrent:16, ESPBlock:47, ESPUnit:119,
ESPStage:167, ESPCNet:237, get_espcnet:320)."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (DualPathSequential, InterpolationBlock, NormActivation,
                  Sequential, avg_pool2d, conv1x1, conv3x3, conv3x3_block)
from ..nn.activ import lambda_prelu
from ..nn.base import Composed
from ..nn.norm import lambda_batchnorm2d
from .registry import register_model

__all__ = ["ESPCNet", "get_espcnet", "ESPBlock"]


class ESPBranches(nn.Module):
    """Hierarchical dilated branches (torch HierarchicalConcurrent with
    exclude_first, reference espcnet.py:16-45)."""

    mid_channels: int = 0
    extra_mid_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        dilations = [1, 2, 4, 8, 16]
        out, y_prev = [], None
        for i, dilation in enumerate(dilations):
            oc = self.extra_mid_channels if i == 0 else self.mid_channels
            y = conv3x3(out_channels=oc, padding=dilation, dilation=dilation,
                        name=f"branch{i + 1}")(x)
            if y_prev is not None:
                y = y + y_prev
            out.append(y)
            if i > 0:  # exclude_first=True: branch1 never seeds the chain
                y_prev = y
        return jnp.concatenate(out, axis=-1)


class ESPBlock(nn.Module):
    """ESP block (reference espcnet.py:47)."""

    out_channels: int = 0
    downsample: bool = False
    residual: bool = False
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        num_branches = 5
        mid_channels = self.out_channels // num_branches
        extra_mid = self.out_channels - (num_branches - 1) * mid_channels
        if self.downsample:
            y = conv3x3(out_channels=mid_channels, stride=2,
                        name="reduce_conv")(x)
        else:
            y = conv1x1(out_channels=mid_channels, name="reduce_conv")(x)
        y = ESPBranches(mid_channels=mid_channels,
                        extra_mid_channels=extra_mid,
                        name="branches")(y, train=train)
        if self.residual:
            y = y + x
        return NormActivation(
            normalization=lambda_batchnorm2d(eps=self.bn_eps),
            activation=lambda_prelu(num_parameters=self.out_channels),
            name="norm_activ")(y, train=train)


class ESPUnit(nn.Module):
    """ESP unit (reference espcnet.py:119)."""

    out_channels: int = 0
    num_layers: int = 1
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = self.out_channels // 2
        x = ESPBlock(out_channels=mid_channels, downsample=True,
                     residual=False, bn_eps=self.bn_eps,
                     name="down")(x, train=train)
        blocks = tuple(ESPBlock(out_channels=mid_channels, downsample=False,
                                residual=True, bn_eps=self.bn_eps,
                                name=f"block{i + 1}", parent=None)
                       for i in range(self.num_layers - 1))
        y = Sequential(layers=blocks, name="blocks")(x, train=train)
        return jnp.concatenate([y, x], axis=-1)


class ESPStage(nn.Module):
    """ESP stage with input injection (reference espcnet.py:167)."""

    x_channels: int = 0
    y_out_channels: int = 0
    num_layers: int = 0
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, y, x, train: bool = False):
        if self.num_layers > 0:
            y = ESPUnit(out_channels=self.y_out_channels - self.x_channels,
                        num_layers=self.num_layers, bn_eps=self.bn_eps,
                        name="unit")(y, train=train)
        if self.x_channels > 0:
            x = avg_pool2d(3, 2, padding=1)(x)
            y = jnp.concatenate([y, x], axis=-1)
        y = NormActivation(
            normalization=lambda_batchnorm2d(eps=self.bn_eps),
            activation=lambda_prelu(num_parameters=self.y_out_channels),
            name="norm_activ")(y, train=train)
        return y, x


class ESPCNet(Composed):
    """ESPNet-C (reference espcnet.py:237)."""

    layers: Any = None
    channels: Any = None
    init_block_channels: int = 16
    cut_x: Any = None
    bn_eps: float = 1e-5
    aux: bool = False
    fixed_size: bool = False
    in_size: Tuple[int, int] = (1024, 2048)
    in_channels: int = 3
    num_classes: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_size = self.in_size if self.fixed_size else x.shape[1:3]
        layers = [conv3x3_block(
            out_channels=self.init_block_channels, stride=2,
            normalization=lambda_batchnorm2d(eps=self.bn_eps),
            activation=lambda_prelu(num_parameters=self.init_block_channels),
            name="init_block", parent=None)]
        for i, (li, oc) in enumerate(zip(self.layers, self.channels)):
            layers.append(ESPStage(
                x_channels=(self.in_channels if self.cut_x[i] == 1 else 0),
                y_out_channels=oc, num_layers=li, bn_eps=self.bn_eps,
                name=f"stage{i + 1}", parent=None))
        y = DualPathSequential(layers=tuple(layers), return_two=False,
                               first_ordinals=1, last_ordinals=0,
                               name="features")(x, x, train=train)
        y = conv1x1(out_channels=self.num_classes, name="head")(y)
        return InterpolationBlock(align_corners=False)(y, size=in_size)


def get_espcnet(**kwargs):
    """Config expander (reference espcnet.py:320)."""
    return ESPCNet(layers=[0, 6, 4], channels=[19, 131, 256],
                   init_block_channels=16, cut_x=[1, 1, 0],
                   bn_eps=kwargs.pop("bn_eps", 1e-3), **kwargs)


@register_model("espcnet_cityscapes")
def espcnet_cityscapes(num_classes: int = 19, **kwargs):
    return get_espcnet(num_classes=num_classes, **kwargs)
