"""DABNet, TPU-native. Behavioral reference: pytorchcv ``models/dabnet.py``
(DwaConvBlock:16, DABBlock:95, DownBlock:150, DABUnit:197, DABStage:240,
DABInitBlock:296, DABNet:343, get_dabnet:446)."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (ConvBlock, DualPathSequential, InterpolationBlock,
                  NormActivation, Sequential, avg_pool2d, conv1x1, conv3x3,
                  conv3x3_block, max_pool2d)
from ..nn.activ import lambda_prelu
from ..nn.base import Composed
from ..nn.norm import lambda_batchnorm2d
from .registry import register_model

__all__ = ["DABNet", "get_dabnet"]


class DwaConvBlock(nn.Module):
    """Depthwise asymmetric conv pair (reference dabnet.py:16)."""

    channels: int = 0
    kernel_size: int = 3
    padding: int = 1
    dilation: int = 1
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        nm = lambda_batchnorm2d(eps=self.bn_eps)
        act = lambda_prelu(num_parameters=self.channels)
        x = ConvBlock(out_channels=self.channels,
                      kernel_size=(self.kernel_size, 1),
                      padding=(self.padding, 0),
                      dilation=(self.dilation, 1), groups=self.channels,
                      normalization=nm, activation=act,
                      name="conv1")(x, train=train)
        x = ConvBlock(out_channels=self.channels,
                      kernel_size=(1, self.kernel_size),
                      padding=(0, self.padding),
                      dilation=(1, self.dilation), groups=self.channels,
                      normalization=nm, activation=act,
                      name="conv2")(x, train=train)
        return x


class DABBranches(nn.Module):
    """Plain + dilated dwa branches summed (torch stacked Concurrent,
    reference dabnet.py:113-123)."""

    channels: int = 0
    dilation: int = 1
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = DwaConvBlock(channels=self.channels, bn_eps=self.bn_eps,
                          name="branches1")(x, train=train)
        b2 = DwaConvBlock(channels=self.channels, padding=self.dilation,
                          dilation=self.dilation, bn_eps=self.bn_eps,
                          name="branches2")(x, train=train)
        return b1 + b2


class DABBlock(nn.Module):
    """DAB base block (reference dabnet.py:95)."""

    channels: int = 0
    dilation: int = 1
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        nm = lambda_batchnorm2d(eps=self.bn_eps)
        mid_channels = self.channels // 2
        x = NormActivation(
            normalization=nm,
            activation=lambda_prelu(num_parameters=self.channels),
            name="norm_activ1")(x, train=train)
        x = conv3x3_block(
            out_channels=mid_channels, normalization=nm,
            activation=lambda_prelu(num_parameters=mid_channels),
            name="conv1")(x, train=train)
        x = DABBranches(channels=mid_channels, dilation=self.dilation,
                        bn_eps=self.bn_eps, name="branches")(x, train=train)
        x = NormActivation(
            normalization=nm,
            activation=lambda_prelu(num_parameters=mid_channels),
            name="norm_activ2")(x, train=train)
        x = conv1x1(out_channels=self.channels, name="conv2")(x)
        return x + identity


class DABDownBlock(nn.Module):
    """DAB downsample block (reference dabnet.py:150)."""

    out_channels: int = 0
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        expand = in_channels < self.out_channels
        mid_channels = self.out_channels - in_channels if expand \
            else self.out_channels
        y = conv3x3(out_channels=mid_channels, stride=2, name="conv")(x)
        if expand:
            z = max_pool2d(2, 2)(x)
            y = jnp.concatenate([y, z], axis=-1)
        return NormActivation(
            normalization=lambda_batchnorm2d(eps=self.bn_eps),
            activation=lambda_prelu(num_parameters=self.out_channels),
            name="norm_activ")(y, train=train)


class DABUnit(nn.Module):
    """Down + DAB block chain, concatenated (reference dabnet.py:197)."""

    out_channels: int = 0
    dilations: Tuple = ()
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = self.out_channels // 2
        x = DABDownBlock(out_channels=mid_channels, bn_eps=self.bn_eps,
                         name="down")(x, train=train)
        blocks = tuple(DABBlock(channels=mid_channels, dilation=d,
                                bn_eps=self.bn_eps, name=f"block{i + 1}",
                                parent=None)
                       for i, d in enumerate(self.dilations))
        y = Sequential(layers=blocks, name="blocks")(x, train=train)
        return jnp.concatenate([y, x], axis=-1)


class DABStage(nn.Module):
    """DAB stage with input-injection branch (reference dabnet.py:240)."""

    y_out_channels: int = 0
    dilations: Tuple = ()
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, y, x, train: bool = False):
        x = avg_pool2d(3, 2, padding=1)(x)
        if len(self.dilations) > 0:
            y = DABUnit(out_channels=self.y_out_channels - x.shape[-1],
                        dilations=tuple(self.dilations),
                        bn_eps=self.bn_eps, name="unit")(y, train=train)
        y = jnp.concatenate([y, x], axis=-1)
        y = NormActivation(
            normalization=lambda_batchnorm2d(eps=self.bn_eps),
            activation=lambda_prelu(num_parameters=self.y_out_channels),
            name="norm_activ")(y, train=train)
        return y, x


class DABInitBlock(nn.Module):
    """Three 3x3 blocks, first strided (reference dabnet.py:296)."""

    out_channels: int = 0
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        nm = lambda_batchnorm2d(eps=self.bn_eps)
        act = lambda_prelu(num_parameters=self.out_channels)
        x = conv3x3_block(out_channels=self.out_channels, stride=2,
                          normalization=nm, activation=act,
                          name="conv1")(x, train=train)
        x = conv3x3_block(out_channels=self.out_channels, normalization=nm,
                          activation=act, name="conv2")(x, train=train)
        return conv3x3_block(out_channels=self.out_channels,
                             normalization=nm, activation=act,
                             name="conv3")(x, train=train)


class DABNet(Composed):
    """DABNet (reference dabnet.py:343)."""

    channels: Any = None
    init_block_channels: int = 32
    dilations: Any = None
    bn_eps: float = 1e-5
    aux: bool = False
    fixed_size: bool = False
    in_size: Tuple[int, int] = (1024, 2048)
    in_channels: int = 3
    num_classes: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_size = self.in_size if self.fixed_size else x.shape[1:3]
        layers = [DABInitBlock(out_channels=self.init_block_channels,
                               bn_eps=self.bn_eps, name="init_block",
                               parent=None)]
        for i, (oc, dil) in enumerate(zip(self.channels, self.dilations)):
            layers.append(DABStage(y_out_channels=oc,
                                   dilations=tuple(dil),
                                   bn_eps=self.bn_eps,
                                   name=f"stage{i + 1}", parent=None))
        y = DualPathSequential(layers=tuple(layers), return_two=False,
                               first_ordinals=1, last_ordinals=0,
                               name="features")(x, x, train=train)
        y = conv1x1(out_channels=self.num_classes, name="classifier")(y)
        return InterpolationBlock(align_corners=False)(y, size=in_size)


def get_dabnet(**kwargs):
    """Config expander (reference dabnet.py:446)."""
    init_block_channels = 32
    channels = [35, 131, 259]
    dilations = [[], [2, 2, 2], [4, 4, 8, 8, 16, 16]]
    return DABNet(channels=channels,
                  init_block_channels=init_block_channels,
                  dilations=dilations,
                  bn_eps=kwargs.pop("bn_eps", 1e-3), **kwargs)


@register_model("dabnet_cityscapes")
def dabnet_cityscapes(num_classes: int = 19, **kwargs):
    return get_dabnet(num_classes=num_classes, **kwargs)
