"""CGNet, TPU-native. Behavioral reference: pytorchcv ``models/cgnet.py``
(CGBlock:17, CGUnit:116, CGStage:171, CGInitBlock:243, CGNet:290,
get_cgnet:392)."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (DualPathSequential, InterpolationBlock, NormActivation,
                  SEBlock, Sequential, avg_pool2d, conv1x1, conv1x1_block,
                  conv3x3_block, depthwise_conv3x3)
from ..nn.activ import lambda_prelu
from ..nn.base import Composed
from ..nn.norm import lambda_batchnorm2d
from .registry import register_model

__all__ = ["CGNet", "get_cgnet"]


class CGBranches(nn.Module):
    """Local + surrounding context depthwise branches (torch ``branches``
    Concurrent, reference cgnet.py:64-69)."""

    channels: int = 0
    dilation: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = depthwise_conv3x3(channels=self.channels, name="branches1")(x)
        b2 = depthwise_conv3x3(channels=self.channels, padding=self.dilation,
                               dilation=self.dilation, name="branches2")(x)
        return jnp.concatenate([b1, b2], axis=-1)


class CGBlock(nn.Module):
    """Context-guided block (reference cgnet.py:17)."""

    out_channels: int = 0
    dilation: int = 2
    se_reduction: int = 8
    down: bool = False
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        nm = lambda_batchnorm2d(eps=self.bn_eps)
        if self.down:
            mid1_channels = self.out_channels
            mid2_channels = 2 * self.out_channels
        else:
            mid1_channels = self.out_channels // 2
            mid2_channels = self.out_channels
        if not self.down:
            identity = x
            x = conv1x1_block(
                out_channels=mid1_channels, normalization=nm,
                activation=lambda_prelu(num_parameters=mid1_channels),
                name="conv1")(x, train=train)
        else:
            x = conv3x3_block(
                out_channels=self.out_channels, stride=2, normalization=nm,
                activation=lambda_prelu(num_parameters=self.out_channels),
                name="conv1")(x, train=train)
        x = CGBranches(channels=mid1_channels, dilation=self.dilation,
                       name="branches")(x, train=train)
        x = NormActivation(
            normalization=nm,
            activation=lambda_prelu(num_parameters=mid2_channels),
            name="norm_activ")(x, train=train)
        if self.down:
            x = conv1x1(out_channels=self.out_channels, name="conv2")(x)
        x = SEBlock(channels=self.out_channels, reduction=self.se_reduction,
                    use_conv=False, name="se")(x)
        if not self.down:
            x = x + identity
        return x


class CGUnit(nn.Module):
    """CG unit: down block + block chain, concatenated
    (reference cgnet.py:116)."""

    out_channels: int = 0
    num_layers: int = 1
    dilation: int = 2
    se_reduction: int = 8
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = self.out_channels // 2
        x = CGBlock(out_channels=mid_channels, dilation=self.dilation,
                    se_reduction=self.se_reduction, down=True,
                    bn_eps=self.bn_eps, name="down")(x, train=train)
        blocks = tuple(CGBlock(out_channels=mid_channels,
                               dilation=self.dilation,
                               se_reduction=self.se_reduction, down=False,
                               bn_eps=self.bn_eps, name=f"block{i + 1}",
                               parent=None)
                       for i in range(self.num_layers - 1))
        y = Sequential(layers=blocks, name="blocks")(x, train=train)
        return jnp.concatenate([y, x], axis=-1)


class CGStage(nn.Module):
    """CG stage with input injection (reference cgnet.py:171)."""

    x_channels: int = 0
    y_out_channels: int = 0
    num_layers: int = 0
    dilation: int = 0
    se_reduction: int = 0
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, y, x, train: bool = False):
        if self.num_layers > 0:
            y = CGUnit(out_channels=self.y_out_channels - self.x_channels,
                       num_layers=self.num_layers, dilation=self.dilation,
                       se_reduction=self.se_reduction, bn_eps=self.bn_eps,
                       name="unit")(y, train=train)
        if self.x_channels > 0:
            x = avg_pool2d(3, 2, padding=1)(x)
            y = jnp.concatenate([y, x], axis=-1)
        y = NormActivation(
            normalization=lambda_batchnorm2d(eps=self.bn_eps),
            activation=lambda_prelu(num_parameters=self.y_out_channels),
            name="norm_activ")(y, train=train)
        return y, x


class CGInitBlock(nn.Module):
    """Three 3x3 blocks, first strided (reference cgnet.py:243)."""

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


class CGNet(Composed):
    """CGNet (reference cgnet.py:290)."""

    layers: Any = None
    channels: Any = None
    init_block_channels: int = 32
    dilations: Any = None
    se_reductions: Any = None
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
        layers = [CGInitBlock(out_channels=self.init_block_channels,
                              bn_eps=self.bn_eps, name="init_block",
                              parent=None)]
        for i, (li, oc) in enumerate(zip(self.layers, self.channels)):
            layers.append(CGStage(
                x_channels=(self.in_channels if self.cut_x[i] == 1 else 0),
                y_out_channels=oc, num_layers=li,
                dilation=self.dilations[i],
                se_reduction=self.se_reductions[i], bn_eps=self.bn_eps,
                name=f"stage{i + 1}", parent=None))
        y = DualPathSequential(layers=tuple(layers), return_two=False,
                               first_ordinals=1, last_ordinals=0,
                               name="features")(x, x, train=train)
        y = conv1x1(out_channels=self.num_classes, name="classifier")(y)
        return InterpolationBlock(align_corners=False)(y, size=in_size)


def get_cgnet(**kwargs):
    """Config expander (reference cgnet.py:392)."""
    return CGNet(layers=[0, 3, 21], channels=[35, 131, 256],
                 init_block_channels=32, dilations=[0, 2, 4],
                 se_reductions=[0, 8, 16], cut_x=[1, 1, 0],
                 bn_eps=kwargs.pop("bn_eps", 1e-3), **kwargs)


@register_model("cgnet_cityscapes")
def cgnet_cityscapes(num_classes: int = 19, **kwargs):
    return get_cgnet(num_classes=num_classes, **kwargs)
