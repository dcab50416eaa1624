"""DARTS for ImageNet-1K, TPU-native (JAX/flax, NHWC).

Behavioral reference: pytorchcv ``models/darts.py`` (DwsConv:15,
DartsConv:69, DartsDwsConv:131, DartsDwsBranch:185, DartsReduceBranch:236,
Stem1Unit:283, stem2_unit:318, GENOTYPE_OPS:391, DartsMainBlock:399,
DartsUnit:455, DARTS:517, get_darts:613) from 'DARTS: Differentiable
Architecture Search' https://arxiv.org/abs/1806.09055.

The searched genotype is a static edge list — the cell unrolls into a
plain conv graph under jit."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import BatchNorm, Identity, avg_pool2d, conv1x1, max_pool2d
from ..nn.arch import IndexedSeq
from ..nn.base import IntPair, dense_kernel_init
from ..nn.conv import _conv2d
from .nasnet import NasDualPathSequential
from .registry import register_model

__all__ = ["DARTS", "get_darts"]


class DartsConv(nn.Module):
    """(ReLU) -> conv -> BN (reference darts.py:69)."""

    out_channels: int = 0
    kernel_size: IntPair = 1
    stride: IntPair = 1
    padding: IntPair = 0
    activate: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.activate:
            x = nn.relu(x)
        x = _conv2d(self.out_channels, self.kernel_size, stride=self.stride,
                    padding=self.padding, bias=False, name="conv")(x)
        return BatchNorm(name="bn")(x, train=train)


def darts_conv1x1(out_channels, name, activate=True):
    return DartsConv(out_channels=out_channels, kernel_size=1, stride=1,
                     padding=0, activate=activate, name=name)


def darts_conv3x3_s2(out_channels, name, activate=True):
    return DartsConv(out_channels=out_channels, kernel_size=3, stride=2,
                     padding=1, activate=activate, name=name)


class _DwsConv(nn.Module):
    """Dilated depthwise + pointwise convs (reference darts.py:15)."""

    out_channels: int = 0
    kernel_size: IntPair = 3
    stride: IntPair = 1
    padding: IntPair = 1
    dilation: IntPair = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        in_channels = x.shape[-1]
        x = _conv2d(in_channels, self.kernel_size, stride=self.stride,
                    padding=self.padding, dilation=self.dilation,
                    groups=in_channels, bias=False, name="dw_conv")(x)
        return conv1x1(out_channels=self.out_channels, bias=False,
                       name="pw_conv")(x)


class DartsDwsConv(nn.Module):
    """ReLU -> (dilated) dws conv -> BN (reference darts.py:131)."""

    out_channels: int = 0
    kernel_size: IntPair = 3
    stride: IntPair = 1
    padding: IntPair = 1
    dilation: IntPair = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(x)
        x = _DwsConv(out_channels=self.out_channels,
                     kernel_size=self.kernel_size, stride=self.stride,
                     padding=self.padding, dilation=self.dilation,
                     name="conv")(x)
        return BatchNorm(name="bn")(x, train=train)


class DartsDwsBranch(nn.Module):
    """Two stacked dws convs (reference darts.py:185)."""

    out_channels: int = 0
    kernel_size: IntPair = 3
    stride: IntPair = 1
    padding: IntPair = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = x.shape[-1]
        x = DartsDwsConv(out_channels=mid_channels,
                         kernel_size=self.kernel_size, stride=self.stride,
                         padding=self.padding, dilation=1, name="conv1")(
                             x, train=train)
        return DartsDwsConv(out_channels=self.out_channels,
                            kernel_size=self.kernel_size, stride=1,
                            padding=self.padding, dilation=1,
                            name="conv2")(x, train=train)


class DartsReduceBranch(nn.Module):
    """Factorized reduce: two shifted stride-2 1x1 convs (reference
    darts.py:236)."""

    out_channels: int = 0
    stride: IntPair = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.out_channels % 2 == 0
        mid_channels = self.out_channels // 2
        x = nn.relu(x)
        x1 = conv1x1(out_channels=mid_channels, stride=self.stride,
                     name="conv1")(x)
        x2 = conv1x1(out_channels=mid_channels, stride=self.stride,
                     name="conv2")(x[:, 1:, 1:, :])
        x = jnp.concatenate([x1, x2], axis=-1)
        return BatchNorm(name="bn")(x, train=train)


class Stem1Unit(nn.Module):
    """Two 3x3/2 conv blocks (reference darts.py:283)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = self.out_channels // 2
        x = darts_conv3x3_s2(mid_channels, "conv1", activate=False)(
            x, train=train)
        return darts_conv3x3_s2(self.out_channels, "conv2",
                                activate=True)(x, train=train)


def _genotype_op(name: str, channels: int, stride, scope_name: str):
    """GENOTYPE_OPS dispatch (reference darts.py:391)."""
    if name == "max_pool_3x3":
        return max_pool2d(kernel_size=3, stride=stride, padding=1)
    if name == "skip_connect":
        if stride == 1:
            return Identity()
        return DartsReduceBranch(out_channels=channels, stride=stride,
                                 name=scope_name, parent=None)
    if name == "dil_conv_3x3":
        return DartsDwsConv(out_channels=channels, kernel_size=3,
                            stride=stride, padding=2, dilation=2,
                            name=scope_name, parent=None)
    if name == "sep_conv_3x3":
        return DartsDwsBranch(out_channels=channels, kernel_size=3,
                              stride=stride, padding=1, name=scope_name,
                              parent=None)
    raise KeyError(name)


class DartsMainBlock(nn.Module):
    """Genotype-described cell (reference darts.py:399)."""

    genotype: Any = ()
    channels: int = 0
    reduction: bool = False

    @nn.compact
    def __call__(self, x, x_prev=None, train: bool = False):
        concat = [2, 3, 4, 5]
        op_names, indices = zip(*self.genotype)
        steps = len(op_names) // 2
        ops = []
        for k, (name, index) in enumerate(zip(op_names, indices)):
            stride = 2 if self.reduction and index < 2 else 1
            ops.append(_genotype_op(name, self.channels, stride, str(k)))
        seq = IndexedSeq(layers=tuple(ops), name="ops")
        states = [x_prev, x]
        for i in range(steps):
            j1, j2 = 2 * i, 2 * i + 1
            y1 = seq(states[indices[j1]], j1, train=train)
            y2 = seq(states[indices[j2]], j2, train=train)
            states.append(y1 + y2)
        return jnp.concatenate([states[i] for i in concat], axis=-1)


class DartsUnit(nn.Module):
    """DARTS unit (reference darts.py:455)."""

    out_channels: int = 0
    genotype: Any = ()
    reduction: bool = False
    prev_reduction: bool = False

    @nn.compact
    def __call__(self, x, x_prev=None, train: bool = False):
        mid_channels = self.out_channels // 4
        if self.prev_reduction:
            x_prev = DartsReduceBranch(out_channels=mid_channels,
                                       name="preprocess_prev")(
                                           x_prev, train=train)
        else:
            x_prev = darts_conv1x1(mid_channels, "preprocess_prev")(
                x_prev, train=train)
        x = darts_conv1x1(mid_channels, "preprocess")(x, train=train)
        return DartsMainBlock(genotype=self.genotype,
                              channels=mid_channels,
                              reduction=self.reduction, name="body")(
                                  x, x_prev, train=train)


class DARTS(nn.Module):
    """DARTS (reference darts.py:517)."""

    channels: Any = ()
    stem_blocks_channels: int = 48
    normal_genotype: Any = ()
    reduce_genotype: Any = ()
    in_channels: int = 3
    in_size: Tuple[int, int] = (224, 224)
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        layers = [
            Stem1Unit(out_channels=self.stem_blocks_channels,
                      name="stem1_unit", parent=None),
            DartsConv(out_channels=self.stem_blocks_channels,
                      kernel_size=3, stride=2, padding=1, activate=True,
                      name="stem2_unit", parent=None),
        ]
        for i, channels_per_stage in enumerate(self.channels):
            units = []
            for j, out_channels in enumerate(channels_per_stage):
                reduction = (i != 0) and (j == 0)
                prev_reduction = ((i == 0) and (j == 0)) or \
                    ((i != 0) and (j == 1))
                genotype = self.reduce_genotype if reduction \
                    else self.normal_genotype
                units.append(DartsUnit(
                    out_channels=out_channels, genotype=genotype,
                    reduction=reduction, prev_reduction=prev_reduction,
                    name=f"unit{j + 1}", parent=None))
            layers.append(NasDualPathSequential(layers=tuple(units),
                                                name=f"stage{i + 1}",
                                                parent=None))
        layers.append(avg_pool2d(kernel_size=7, stride=1))
        x = NasDualPathSequential(layers=tuple(layers), return_two=False,
                                  first_ordinals=2, last_ordinals=1,
                                  name="features")(x, train=train)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.num_classes, kernel_init=dense_kernel_init,
                        name="output")(x)


def get_darts(**kwargs) -> DARTS:
    """Config expander (reference darts.py:613)."""
    stem_blocks_channels = 48
    layers = [4, 5, 5]
    channels_per_layers = [192, 384, 768]
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    normal_genotype = (
        ("sep_conv_3x3", 0), ("sep_conv_3x3", 1), ("sep_conv_3x3", 0),
        ("sep_conv_3x3", 1), ("sep_conv_3x3", 1), ("skip_connect", 0),
        ("skip_connect", 0), ("dil_conv_3x3", 2))
    reduce_genotype = (
        ("max_pool_3x3", 0), ("max_pool_3x3", 1), ("skip_connect", 2),
        ("max_pool_3x3", 1), ("max_pool_3x3", 0), ("skip_connect", 2),
        ("skip_connect", 2), ("max_pool_3x3", 1))
    return DARTS(channels=tuple(tuple(c) for c in channels),
                 stem_blocks_channels=stem_blocks_channels,
                 normal_genotype=normal_genotype,
                 reduce_genotype=reduce_genotype, **kwargs)


@register_model("darts")
def darts(**kwargs):
    return get_darts(**kwargs)
