"""ESPNetv2 for ImageNet-1K, TPU-native (JAX/flax, NHWC).

Behavioral reference: pytorchcv ``models/espnetv2.py`` (PreActivation:16,
ShortcutBlock:43, HierarchicalConcurrent:80, ESPBlock:106,
DownsampleBlock:189, ESPInitBlock:244, ESPFinalBlock:279, ESPNetv2:327,
get_espnetv2:446) from 'ESPNetv2: A Light-weight, Power Efficient, and
General Purpose Convolutional Neural Network'
https://arxiv.org/abs/1811.11431.

The EESP block's hierarchically-summed dilated depthwise branches are
independent convs whose running sums XLA fuses; the dual-path (x, x0)
input-reinjection thread rides the shared DualPathSequential cell."""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (BatchNorm, DualPathSequential, PReLU, Sequential,
                  avg_pool2d, conv1x1_block, conv3x3, conv3x3_block,
                  lambda_prelu)
from ..nn.base import Composed, IntPair, dense_kernel_init
from .registry import register_model

__all__ = ["ESPNetv2", "ESPBlock", "get_espnetv2"]


class PreActivation(nn.Module):
    """BN + PReLU (reference espnetv2.py:16)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(name="bn")(x, train=train)
        return PReLU(num_parameters=x.shape[-1], name="activ")(x)


class ShortcutBlock(nn.Module):
    """Input-reinjection shortcut (reference espnetv2.py:43)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        x = conv3x3_block(out_channels=in_channels,
                          activation=lambda_prelu(in_channels),
                          name="conv1")(x, train=train)
        return conv1x1_block(out_channels=self.out_channels,
                             activation=None, name="conv2")(x, train=train)


class HierarchicalConcurrent(Composed):
    """Branches with hierarchical summation before concat (reference
    espnetv2.py:80)."""

    layers: Any = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        cache: dict = {}
        outs = []
        y_prev = None
        for layer in self.layers:
            y = self.adopt(layer, cache)(x)
            if y_prev is not None:
                y = y + y_prev
            outs.append(y)
            y_prev = y
        return jnp.concatenate(outs, axis=-1)


class ESPBlock(nn.Module):
    """EESP block (reference espnetv2.py:106). NB: the reference applies
    the pre-activation BEFORE the merge conv."""

    out_channels: int = 0
    stride: IntPair = 1
    dilations: Any = (1, 2, 3, 4)

    @nn.compact
    def __call__(self, x, x0, train: bool = False):
        num_branches = len(self.dilations)
        assert self.out_channels % num_branches == 0
        downsample = self.stride != 1
        mid_channels = self.out_channels // num_branches
        y = conv1x1_block(out_channels=mid_channels, groups=num_branches,
                          activation=lambda_prelu(mid_channels),
                          name="reduce_conv")(x, train=train)
        y = HierarchicalConcurrent(layers=tuple(
            conv3x3(out_channels=mid_channels, stride=self.stride,
                    padding=d, dilation=d, groups=mid_channels,
                    name=f"branch{i + 1}", parent=None)
            for i, d in enumerate(self.dilations)), name="branches")(
                y, train=train)
        y = PreActivation(name="preactiv")(y, train=train)
        y = conv1x1_block(out_channels=self.out_channels,
                          groups=num_branches, activation=None,
                          name="merge_conv")(y, train=train)
        if not downsample:
            y = y + x
            y = PReLU(num_parameters=self.out_channels, name="activ")(y)
        return y, x0


class DownsampleBlock(nn.Module):
    """Strided EESP + avg-pool, fused with reinjected input (reference
    espnetv2.py:189)."""

    out_channels: int = 0
    dilations: Any = (1, 2, 3, 4)

    @nn.compact
    def __call__(self, x, x0, train: bool = False):
        in_channels = x.shape[-1]
        inc_channels = self.out_channels - in_channels
        pool = avg_pool2d(kernel_size=3, stride=2, padding=1)
        y1 = pool(x)
        y2, _ = ESPBlock(out_channels=inc_channels, stride=2,
                         dilations=self.dilations, name="eesp")(
                             x, None, train=train)
        x = jnp.concatenate([y1, y2], axis=-1)
        x0 = pool(x0)
        y3 = ShortcutBlock(out_channels=self.out_channels,
                           name="shortcut_block")(x0, train=train)
        x = x + y3
        x = PReLU(num_parameters=self.out_channels, name="activ")(x)
        return x, x0


class ESPInitBlock(nn.Module):
    """3x3/2 conv; pools the reinjection path (reference
    espnetv2.py:244)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, x0, train: bool = False):
        x = conv3x3_block(out_channels=self.out_channels, stride=2,
                          activation=lambda_prelu(self.out_channels),
                          name="conv")(x, train=train)
        x0 = avg_pool2d(kernel_size=3, stride=2, padding=1)(x0)
        return x, x0


class ESPFinalBlock(nn.Module):
    """depthwise 3x3 + grouped 1x1 (reference espnetv2.py:279)."""

    out_channels: int = 0
    final_groups: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        x = conv3x3_block(out_channels=in_channels, groups=in_channels,
                          activation=lambda_prelu(in_channels),
                          name="conv1")(x, train=train)
        return conv1x1_block(out_channels=self.out_channels,
                             groups=self.final_groups,
                             activation=lambda_prelu(self.out_channels),
                             name="conv2")(x, train=train)


class ESPNetv2(nn.Module):
    """ESPNetv2 (reference espnetv2.py:327)."""

    channels: Any = ()
    init_block_channels: int = 32
    final_block_channels: int = 1024
    final_block_groups: int = 4
    dilations: Any = ()
    dropout_rate: float = 0.2
    in_channels: int = 3
    in_size: Tuple[int, int] = (224, 224)
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        layers = [ESPInitBlock(out_channels=self.init_block_channels,
                               name="init_block", parent=None)]
        for i, channels_per_stage in enumerate(self.channels):
            units = []
            for j, out_channels in enumerate(channels_per_stage):
                if j == 0:
                    units.append(DownsampleBlock(
                        out_channels=out_channels,
                        dilations=tuple(self.dilations[i][j]),
                        name=f"unit{j + 1}", parent=None))
                else:
                    units.append(ESPBlock(
                        out_channels=out_channels, stride=1,
                        dilations=tuple(self.dilations[i][j]),
                        name=f"unit{j + 1}", parent=None))
            layers.append(DualPathSequential(layers=tuple(units),
                                             name=f"stage{i + 1}",
                                             parent=None))
        layers.append(ESPFinalBlock(out_channels=self.final_block_channels,
                                    final_groups=self.final_block_groups,
                                    name="final_block", parent=None))
        layers.append(avg_pool2d(kernel_size=7, stride=1))
        x = DualPathSequential(layers=tuple(layers), return_two=False,
                               first_ordinals=0, last_ordinals=2,
                               name="features")(x, x, train=train)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dropout(rate=self.dropout_rate,
                       deterministic=not train)(x)
        return Sequential(layers=(
            nn.Dense(self.num_classes, kernel_init=dense_kernel_init,
                     name="fc", parent=None),
        ), name="output")(x, train=train)


def get_espnetv2(width_scale: float, **kwargs) -> ESPNetv2:
    """Config expander (reference espnetv2.py:446)."""
    assert width_scale <= 2.0
    branches = 4
    layers = [1, 4, 8, 4]
    max_dilation_list = [6, 5, 4, 3, 2]
    max_dilations = [[max_dilation_list[i]] +
                     [max_dilation_list[i + 1]] * (li - 1)
                     for i, li in enumerate(layers)]
    dilations = [[sorted([k + 1 if k < dij else 1 for k in range(branches)])
                  for dij in di] for di in max_dilations]
    base_channels = 32
    weighed_base_channels = math.ceil(
        float(math.floor(base_channels * width_scale)) / branches) * branches
    channels_per_layers = [weighed_base_channels * pow(2, i + 1)
                           for i in range(len(layers))]
    init_block_channels = base_channels \
        if weighed_base_channels > base_channels else weighed_base_channels
    final_block_channels = 1024 if width_scale <= 1.5 else 1280
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    return ESPNetv2(channels=tuple(tuple(c) for c in channels),
                    init_block_channels=init_block_channels,
                    final_block_channels=final_block_channels,
                    final_block_groups=branches,
                    dilations=tuple(tuple(tuple(d) for d in di)
                                    for di in dilations), **kwargs)


@register_model("espnetv2_wd2")
def espnetv2_wd2(**kwargs):
    return get_espnetv2(width_scale=0.5, **kwargs)


@register_model("espnetv2_w1")
def espnetv2_w1(**kwargs):
    return get_espnetv2(width_scale=1.0, **kwargs)


@register_model("espnetv2_w5d4")
def espnetv2_w5d4(**kwargs):
    return get_espnetv2(width_scale=1.25, **kwargs)


@register_model("espnetv2_w3d2")
def espnetv2_w3d2(**kwargs):
    return get_espnetv2(width_scale=1.5, **kwargs)


@register_model("espnetv2_w2")
def espnetv2_w2(**kwargs):
    return get_espnetv2(width_scale=2.0, **kwargs)
