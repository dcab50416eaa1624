"""PNASNet-5-Large for ImageNet-1K, TPU-native (JAX/flax, NHWC).

Behavioral reference: pytorchcv ``models/pnasnet.py`` (PnasMaxPoolBlock:15,
pnas_conv1x1:55, DwsBranch:82, PnasMaxPathBlock:204, PnasBaseUnit:240,
Stem1Unit:274, PnasUnit:338, PNASNet:443, get_pnasnet:550) from
'Progressive Neural Architecture Search' https://arxiv.org/abs/1712.00559.
Reuses the NASNet vocabulary cells."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import Sequential, avg_pool2d, conv1x1, max_pool2d
from ..nn.base import IntPair, dense_kernel_init
from .nasnet import (NASNetInitBlock, NasConv, NasDualPathSequential,
                     NasDwsConv, NasPathBlock, _pad_tl, nasnet_batch_norm)
from .registry import register_model

__all__ = ["PNASNet", "get_pnasnet"]


class PnasMaxPoolBlock(nn.Module):
    """maxpool3x3 with optional asymmetric pad+crop (reference
    pnasnet.py:15)."""

    stride: IntPair = 2
    extra_padding: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        if self.extra_padding:
            x = _pad_tl(x)
        x = max_pool2d(kernel_size=3, stride=self.stride, padding=1)(x)
        if self.extra_padding:
            x = x[:, 1:, 1:, :]
        return x


def pnas_conv1x1(out_channels, name, stride=1):
    return NasConv(out_channels=out_channels, kernel_size=1, stride=stride,
                   padding=0, groups=1, name=name)


class DwsBranch(nn.Module):
    """Two stacked NasDwsConvs, k//2 padding (reference pnasnet.py:82)."""

    out_channels: int = 0
    kernel_size: int = 3
    stride: IntPair = 2
    extra_padding: bool = False
    stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert (not self.stem) or (not self.extra_padding)
        mid_channels = self.out_channels if self.stem else x.shape[-1]
        padding = self.kernel_size // 2
        x = NasDwsConv(out_channels=mid_channels,
                       kernel_size=self.kernel_size, stride=self.stride,
                       padding=padding, extra_padding=self.extra_padding,
                       name="conv1")(x, train=train)
        return NasDwsConv(out_channels=self.out_channels,
                          kernel_size=self.kernel_size, stride=1,
                          padding=padding, name="conv2")(x, train=train)


def dws_branch_k3(out_channels, name, stride=2, extra_padding=False,
                  stem=False):
    return DwsBranch(out_channels=out_channels, kernel_size=3,
                     stride=stride, extra_padding=extra_padding, stem=stem,
                     name=name)


def dws_branch_k5(out_channels, name, stride=2, extra_padding=False,
                  stem=False):
    return DwsBranch(out_channels=out_channels, kernel_size=5,
                     stride=stride, extra_padding=extra_padding, stem=stem,
                     name=name)


def dws_branch_k7(out_channels, name, stride=2, extra_padding=False):
    return DwsBranch(out_channels=out_channels, kernel_size=7,
                     stride=stride, extra_padding=extra_padding, stem=False,
                     name=name)


class PnasMaxPathBlock(nn.Module):
    """maxpool + 1x1 conv + BN (reference pnasnet.py:204)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = PnasMaxPoolBlock(name="maxpool")(x, train=train)
        x = conv1x1(out_channels=self.out_channels, name="conv")(x)
        return nasnet_batch_norm()(x, train=train)


def _pnas_cell(self, x, x_prev, mid, stride, extra_padding, reduction,
               train):
    """Shared cell wiring (reference PnasBaseUnit.cell_forward:250)."""
    x_left = x_prev
    x_right = x
    x0 = dws_branch_k5(mid, "comb0_left", stride=stride,
                       extra_padding=extra_padding)(x_left, train=train) + \
        PnasMaxPoolBlock(stride=stride, extra_padding=extra_padding,
                         name="comb0_right")(x_left, train=train)
    x1 = dws_branch_k7(mid, "comb1_left", stride=stride,
                       extra_padding=extra_padding)(x_right, train=train) + \
        PnasMaxPoolBlock(stride=stride, extra_padding=extra_padding,
                         name="comb1_right")(x_right, train=train)
    x2 = dws_branch_k5(mid, "comb2_left", stride=stride,
                       extra_padding=extra_padding)(x_right, train=train) + \
        dws_branch_k3(mid, "comb2_right", stride=stride,
                      extra_padding=extra_padding)(x_right, train=train)
    x3 = dws_branch_k3(mid, "comb3_left", stride=1)(x2, train=train) + \
        PnasMaxPoolBlock(stride=stride, extra_padding=extra_padding,
                         name="comb3_right")(x_right, train=train)
    x4 = dws_branch_k3(mid, "comb4_left", stride=stride,
                       extra_padding=extra_padding)(x_left, train=train)
    if reduction:
        x4 = x4 + pnas_conv1x1(mid, "comb4_right", stride=stride)(
            x_right, train=train)
    else:
        x4 = x4 + x_right
    return jnp.concatenate([x0, x1, x2, x3, x4], axis=-1)


class Stem1Unit(nn.Module):
    """Stem1 cell (reference pnasnet.py:274). Its comb0/comb4 left branches
    and max-path take the RAW input (stem wiring)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, x_prev=None, train: bool = False):
        del x_prev
        mid = self.out_channels // 5
        x_prev_ = x
        x_ = pnas_conv1x1(mid, "conv_1x1")(x, train=train)
        x_left = x_prev_
        x_right = x_
        x0 = dws_branch_k5(mid, "comb0_left", stem=True)(
            x_left, train=train) + \
            PnasMaxPathBlock(out_channels=mid, name="comb0_right")(
                x_left, train=train)
        x1 = dws_branch_k7(mid, "comb1_left")(x_right, train=train) + \
            PnasMaxPoolBlock(name="comb1_right")(x_right, train=train)
        x2 = dws_branch_k5(mid, "comb2_left")(x_right, train=train) + \
            dws_branch_k3(mid, "comb2_right")(x_right, train=train)
        x3 = dws_branch_k3(mid, "comb3_left", stride=1)(x2, train=train) + \
            PnasMaxPoolBlock(name="comb3_right")(x_right, train=train)
        x4 = dws_branch_k3(mid, "comb4_left", stem=True)(
            x_left, train=train) + \
            pnas_conv1x1(mid, "comb4_right", stride=2)(x_right, train=train)
        return jnp.concatenate([x0, x1, x2, x3, x4], axis=-1)


class PnasUnit(nn.Module):
    """Ordinary PNASNet cell (reference pnasnet.py:338)."""

    out_channels: int = 0
    reduction: bool = False
    extra_padding: bool = False
    match_prev_layer_dimensions: bool = False

    @nn.compact
    def __call__(self, x, x_prev=None, train: bool = False):
        mid = self.out_channels // 5
        stride = 2 if self.reduction else 1
        if self.match_prev_layer_dimensions:
            x_prev = NasPathBlock(out_channels=mid, name="conv_prev_1x1")(
                x_prev, train=train)
        else:
            x_prev = pnas_conv1x1(mid, "conv_prev_1x1")(x_prev, train=train)
        x = pnas_conv1x1(mid, "conv_1x1")(x, train=train)
        return _pnas_cell(self, x, x_prev, mid, stride, self.extra_padding,
                          self.reduction, train)


class PNASNet(nn.Module):
    """PNASNet (reference pnasnet.py:443)."""

    channels: Any = ()
    init_block_channels: int = 96
    stem1_blocks_channels: int = 270
    in_channels: int = 3
    in_size: Tuple[int, int] = (331, 331)
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        layers = [
            NASNetInitBlock(out_channels=self.init_block_channels,
                            name="init_block", parent=None),
            Stem1Unit(out_channels=self.stem1_blocks_channels,
                      name="stem1_unit", parent=None),
        ]
        for i, channels_per_stage in enumerate(self.channels):
            units = []
            for j, out_channels in enumerate(channels_per_stage):
                units.append(PnasUnit(
                    out_channels=out_channels,
                    reduction=(j == 0),
                    extra_padding=(j == 0) and (i not in [0, 2]),
                    match_prev_layer_dimensions=(j == 1) or
                    ((j == 0) and (i == 0)),
                    name=f"unit{j + 1}", parent=None))
            layers.append(NasDualPathSequential(layers=tuple(units),
                                                name=f"stage{i + 1}",
                                                parent=None))
        layers.append(nn.relu)
        layers.append(avg_pool2d(kernel_size=11, stride=1))
        x = NasDualPathSequential(layers=tuple(layers), return_two=False,
                                  first_ordinals=2, last_ordinals=2,
                                  name="features")(x, train=train)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dropout(rate=0.5, deterministic=not train)(x)
        return Sequential(layers=(
            nn.Dense(self.num_classes, kernel_init=dense_kernel_init,
                     name="fc", parent=None),
        ), name="output")(x, train=train)


def get_pnasnet(**kwargs) -> PNASNet:
    """Config expander (reference pnasnet.py:550)."""
    repeat = 4
    init_block_channels = 96
    stem_blocks_channels = [270, 540]
    norm_channels = [1080, 2160, 4320]
    channels = [[ci] * repeat for ci in norm_channels]
    stem1_blocks_channels = stem_blocks_channels[0]
    channels[0] = [stem_blocks_channels[1]] + channels[0]
    return PNASNet(channels=tuple(tuple(c) for c in channels),
                   init_block_channels=init_block_channels,
                   stem1_blocks_channels=stem1_blocks_channels, **kwargs)


@register_model("pnasnet5large")
def pnasnet5large(**kwargs):
    return get_pnasnet(**kwargs)
