"""EfficientNet-Edge, TPU-native. Behavioral reference: pytorchcv
``models/efficientnetedge.py`` (EffiEdgeResUnit:15, EfficientNetEdge:93,
get_efficientnet_edge:219)."""

from __future__ import annotations

import math
from functools import reduce
from typing import Any, Tuple

from flax import linen as nn

from ..nn import (SEBlock, Sequential, conv1x1_block, conv3x3_block,
                  global_avg_pool2d, round_channels)
from ..nn.activ import lambda_relu
from ..nn.norm import lambda_batchnorm2d
from .efficientnet import EffiInitBlock, EffiInvResUnit, EffiOutput
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["EfficientNetEdge", "get_efficientnet_edge"]


class EffiEdgeResUnit(nn.Module):
    """Edge residual unit: fused 3x3 expand + 1x1 project
    (reference efficientnetedge.py:15)."""

    out_channels: int = 0
    stride: int = 1
    exp_factor: int = 1
    se_factor: int = 0
    mid_from_in: bool = True
    use_skip: bool = True
    normalization: Any = None
    activation: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        residual = (in_channels == self.out_channels) and \
            (self.stride == 1) and self.use_skip
        identity = x
        mid_channels = in_channels * self.exp_factor if self.mid_from_in \
            else self.out_channels * self.exp_factor
        x = conv3x3_block(out_channels=mid_channels,
                          normalization=self.normalization,
                          activation=self.activation,
                          name="conv1")(x, train=train)
        if self.se_factor > 0:
            x = SEBlock(channels=mid_channels,
                        reduction=(self.exp_factor * self.se_factor),
                        mid_activation=self.activation, name="se")(x)
        x = conv1x1_block(out_channels=self.out_channels, stride=self.stride,
                          normalization=self.normalization, activation=None,
                          name="conv2")(x, train=train)
        if residual:
            x = x + identity
        return x


def EfficientNetEdge(channels, init_block_channels: int,
                     final_block_channels: int, kernel_sizes,
                     strides_per_stage, expansion_factors,
                     dropout_rate: float = 0.2, tf_mode: bool = False,
                     bn_eps: float = 1e-5, in_channels: int = 3,
                     in_size: Tuple[int, int] = (224, 224),
                     num_classes: int = 1000) -> ImageClassifier:
    """EfficientNet-Edge (reference efficientnetedge.py:93)."""
    normalization = lambda_batchnorm2d(eps=bn_eps)
    activation = lambda_relu()
    layers = [EffiInitBlock(out_channels=init_block_channels,
                            normalization=normalization,
                            activation=activation, tf_mode=tf_mode,
                            name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = strides_per_stage[i] if j == 0 else 1
            if i < 3:
                units.append(EffiEdgeResUnit(
                    out_channels=out_channels, stride=stride,
                    exp_factor=expansion_factors[i][j], se_factor=0,
                    mid_from_in=(i != 0), use_skip=(i != 0),
                    normalization=normalization, activation=activation,
                    name=f"unit{j + 1}"))
            else:
                units.append(EffiInvResUnit(
                    out_channels=out_channels,
                    kernel_size=kernel_sizes[i][j], stride=stride,
                    exp_factor=expansion_factors[i][j], se_factor=0,
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


def get_efficientnet_edge(version: str, in_size: Tuple[int, int],
                          tf_mode: bool = False, bn_eps: float = 1e-5,
                          **kwargs):
    """Config expander (reference efficientnetedge.py:219)."""
    dropout_rate = 0.0
    if version == "small":
        depth_factor, width_factor = 1.0, 1.0
    elif version == "medium":
        depth_factor, width_factor = 1.1, 1.0
    elif version == "large":
        depth_factor, width_factor = 1.4, 1.2
    else:
        raise ValueError(f"Unsupported EfficientNet-Edge version {version}")
    init_block_channels = 32
    layers = [1, 2, 4, 5, 4, 2]
    downsample = [1, 1, 1, 1, 0, 1]
    channels_per_layers = [24, 32, 48, 96, 144, 192]
    expansion_factors_per_layers = [4, 8, 8, 8, 8, 8]
    kernel_sizes_per_layers = [3, 3, 3, 5, 5, 5]
    strides_per_stage = [1, 2, 2, 2, 1, 2]
    final_block_channels = 1280
    layers = [int(math.ceil(li * depth_factor)) for li in layers]
    channels_per_layers = [round_channels(ci * width_factor)
                           for ci in channels_per_layers]

    def expand(prop):
        return reduce(
            lambda x, y: x + [[y[0]] * y[1]] if y[2] != 0
            else x[:-1] + [x[-1] + [y[0]] * y[1]],
            zip(prop, layers, downsample), [])

    channels = expand(channels_per_layers)
    kernel_sizes = expand(kernel_sizes_per_layers)
    expansion_factors = expand(expansion_factors_per_layers)
    strides_per_stage = [si[0] for si in expand(strides_per_stage)]
    init_block_channels = round_channels(init_block_channels * width_factor)
    if width_factor > 1.0:
        final_block_channels = round_channels(
            final_block_channels * width_factor)
    return EfficientNetEdge(
        channels=channels, init_block_channels=init_block_channels,
        final_block_channels=final_block_channels,
        kernel_sizes=kernel_sizes, strides_per_stage=strides_per_stage,
        expansion_factors=expansion_factors, dropout_rate=dropout_rate,
        tf_mode=tf_mode, bn_eps=bn_eps, in_size=in_size, **kwargs)


@register_model("efficientnet_edge_small_b")
def efficientnet_edge_small_b(in_size=(224, 224), **kwargs):
    return get_efficientnet_edge(version="small", in_size=in_size,
                                 tf_mode=True, bn_eps=1e-3, **kwargs)


@register_model("efficientnet_edge_medium_b")
def efficientnet_edge_medium_b(in_size=(240, 240), **kwargs):
    return get_efficientnet_edge(version="medium", in_size=in_size,
                                 tf_mode=True, bn_eps=1e-3, **kwargs)


@register_model("efficientnet_edge_large_b")
def efficientnet_edge_large_b(in_size=(300, 300), **kwargs):
    return get_efficientnet_edge(version="large", in_size=in_size,
                                 tf_mode=True, bn_eps=1e-3, **kwargs)
