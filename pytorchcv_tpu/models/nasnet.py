"""NASNet-A for ImageNet-1K, TPU-native (JAX/flax, NHWC).

Behavioral reference: pytorchcv ``models/nasnet.py`` (NasDualPathScheme:17,
nasnet_dual_path_sequential:68, nasnet_batch_norm:97, NasMaxPoolBlock:158,
NasAvgPoolBlock:194, NasConv:233, DwsConv:300, NasDwsConv:354,
DwsBranch:425, NasPathBranch:565, NasPathBlock:610, Stem1Unit:654,
Stem2Unit:723, FirstUnit:805, NormalUnit:875, ReductionBaseUnit:948,
Reduction1Unit:1030, Reduction2Unit:1055, NASNetInitBlock:1086,
NASNet:1121, get_nasnet:1243) from 'Learning Transferable Architectures
for Scalable Image Recognition' https://arxiv.org/abs/1707.07012.

The searched cells are static python graphs of small depthwise-separable
branches; the asymmetric ``extra_padding`` shift (pad top-left, crop after)
is two cheap slice ops XLA folds into the conv's padding config."""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (BatchNorm, Sequential, avg_pool2d, conv1x1, max_pool2d)
from ..nn.base import Composed, IntPair, call_block, dense_kernel_init
from ..nn.conv import _conv2d
from .registry import register_model

__all__ = ["NASNet", "NasDualPathSequential", "nasnet_batch_norm",
           "NasConv", "NasDwsConv", "NasPathBlock", "NASNetInitBlock",
           "get_nasnet"]


class NasDualPathSequential(Composed):
    """NASNet dual-path container (reference nasnet.py:17-95): each cell
    maps (x, x_prev) -> x_next and the pair shifts to (x_next, x); a
    reduction cell with ``skip_input`` passes x_prev through instead."""

    layers: Sequence[Any] = ()
    return_two: bool = True
    first_ordinals: int = 0
    last_ordinals: int = 0
    can_skip_input: bool = False

    @nn.compact
    def __call__(self, x, x_prev=None, train: bool = False):
        cache: dict = {}
        length = len(self.layers)
        for i, layer in enumerate(self.layers):
            m = self.adopt(layer, cache)
            if (i < self.first_ordinals) or \
                    (i >= length - self.last_ordinals):
                # ordinal scheme shifts x_prev to the pre-module x
                # (reference nasnet_dual_path_scheme_ordinal:47)
                x, x_prev = call_block(m, x, train=train), x
            else:
                x_next = m(x, x_prev, train=train)
                if isinstance(x_next, tuple):
                    x_next, x = x_next
                new_prev = x
                if self.can_skip_input and \
                        getattr(m, "skip_input", False):
                    new_prev = x_prev
                x, x_prev = x_next, new_prev
        if self.return_two:
            return x, x_prev
        return x


def nasnet_batch_norm(name: str = "bn") -> BatchNorm:
    """NASNet BN: eps 1e-3 (reference nasnet.py:97)."""
    return BatchNorm(epsilon=1e-3, name=name)


def nasnet_avgpool1x1_s2():
    return avg_pool2d(kernel_size=1, stride=2, count_include_pad=False)


def nasnet_avgpool3x3_s1():
    return avg_pool2d(kernel_size=3, stride=1, padding=1,
                      count_include_pad=False)


def nasnet_avgpool3x3_s2():
    return avg_pool2d(kernel_size=3, stride=2, padding=1,
                      count_include_pad=False)


def _pad_tl(x):
    """Zero-pad top-left (torch ZeroPad2d((1, 0, 1, 0)))."""
    return jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))


class NasMaxPoolBlock(nn.Module):
    """maxpool3x3/2 with optional asymmetric pad+crop (reference
    nasnet.py:158)."""

    extra_padding: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        if self.extra_padding:
            x = _pad_tl(x)
        x = max_pool2d(kernel_size=3, stride=2, padding=1)(x)
        if self.extra_padding:
            x = x[:, 1:, 1:, :]
        return x


class NasAvgPoolBlock(nn.Module):
    """avgpool3x3/2 with optional asymmetric pad+crop (reference
    nasnet.py:194)."""

    extra_padding: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        if self.extra_padding:
            x = _pad_tl(x)
        x = nasnet_avgpool3x3_s2()(x)
        if self.extra_padding:
            x = x[:, 1:, 1:, :]
        return x


class NasConv(nn.Module):
    """ReLU -> conv -> BN (reference nasnet.py:233)."""

    out_channels: int = 0
    kernel_size: IntPair = 1
    stride: IntPair = 1
    padding: IntPair = 0
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(x)
        x = _conv2d(self.out_channels, self.kernel_size, stride=self.stride,
                    padding=self.padding, groups=self.groups, bias=False,
                    name="conv")(x)
        return nasnet_batch_norm()(x, train=train)


def nas_conv1x1(out_channels: int, name: str, parent="unset") -> NasConv:
    kw = {} if parent == "unset" else {"parent": parent}
    return NasConv(out_channels=out_channels, kernel_size=1, stride=1,
                   padding=0, groups=1, name=name, **kw)


class DwsConv(nn.Module):
    """Raw depthwise + pointwise convs (reference nasnet.py:300)."""

    out_channels: int = 0
    kernel_size: IntPair = 3
    stride: IntPair = 1
    padding: IntPair = 1
    bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        in_channels = x.shape[-1]
        x = _conv2d(in_channels, self.kernel_size, stride=self.stride,
                    padding=self.padding, groups=in_channels,
                    bias=self.bias, name="dw_conv")(x)
        return conv1x1(out_channels=self.out_channels, bias=self.bias,
                       name="pw_conv")(x)


class NasDwsConv(nn.Module):
    """ReLU -> (pad) -> DwsConv -> (crop) -> BN (reference
    nasnet.py:354)."""

    out_channels: int = 0
    kernel_size: IntPair = 3
    stride: IntPair = 1
    padding: IntPair = 1
    extra_padding: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(x)
        if self.extra_padding:
            x = _pad_tl(x)
        x = DwsConv(out_channels=self.out_channels,
                    kernel_size=self.kernel_size, stride=self.stride,
                    padding=self.padding, name="conv")(x)
        if self.extra_padding:
            x = x[:, 1:, 1:, :]
        return nasnet_batch_norm()(x, train=train)


class DwsBranch(nn.Module):
    """Two stacked NasDwsConvs (reference nasnet.py:425)."""

    out_channels: int = 0
    kernel_size: IntPair = 3
    stride: IntPair = 1
    padding: IntPair = 1
    extra_padding: bool = False
    stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert (not self.stem) or (not self.extra_padding)
        mid_channels = self.out_channels if self.stem else x.shape[-1]
        x = NasDwsConv(out_channels=mid_channels,
                       kernel_size=self.kernel_size, stride=self.stride,
                       padding=self.padding,
                       extra_padding=self.extra_padding, name="conv1")(
                           x, train=train)
        return NasDwsConv(out_channels=self.out_channels,
                          kernel_size=self.kernel_size, stride=1,
                          padding=self.padding, name="conv2")(
                              x, train=train)


def dws_branch_k3_s1_p1(out_channels, name, extra_padding=False):
    return DwsBranch(out_channels=out_channels, kernel_size=3, stride=1,
                     padding=1, extra_padding=extra_padding, name=name)


def dws_branch_k5_s1_p2(out_channels, name, extra_padding=False):
    return DwsBranch(out_channels=out_channels, kernel_size=5, stride=1,
                     padding=2, extra_padding=extra_padding, name=name)


def dws_branch_k5_s2_p2(out_channels, name, extra_padding=False,
                        stem=False):
    return DwsBranch(out_channels=out_channels, kernel_size=5, stride=2,
                     padding=2, extra_padding=extra_padding, stem=stem,
                     name=name)


def dws_branch_k7_s2_p3(out_channels, name, extra_padding=False,
                        stem=False):
    return DwsBranch(out_channels=out_channels, kernel_size=7, stride=2,
                     padding=3, extra_padding=extra_padding, stem=stem,
                     name=name)


class NasPathBranch(nn.Module):
    """Shifted stride-2 1x1 path (reference nasnet.py:565)."""

    out_channels: int = 0
    extra_padding: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        if self.extra_padding:
            # pad bottom-right then shift one pixel
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))[:, 1:, 1:, :]
        x = nasnet_avgpool1x1_s2()(x)
        return conv1x1(out_channels=self.out_channels, name="conv")(x)


class NasPathBlock(nn.Module):
    """Two half-paths concatenated + BN (reference nasnet.py:610)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = self.out_channels // 2
        x = nn.relu(x)
        x1 = NasPathBranch(out_channels=mid_channels, name="path1")(
            x, train=train)
        x2 = NasPathBranch(out_channels=mid_channels, extra_padding=True,
                           name="path2")(x, train=train)
        x = jnp.concatenate([x1, x2], axis=-1)
        return nasnet_batch_norm()(x, train=train)


class Stem1Unit(nn.Module):
    """Stem1 cell (reference nasnet.py:654)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, x_prev=None, train: bool = False):
        del x_prev
        mid = self.out_channels // 4
        x_left = nas_conv1x1(mid, "conv1x1")(x, train=train)
        x_right = x
        x0 = dws_branch_k5_s2_p2(mid, "comb0_left")(x_left, train=train) + \
            dws_branch_k7_s2_p3(mid, "comb0_right", stem=True)(
                x_right, train=train)
        x1 = NasMaxPoolBlock(name="comb1_left")(x_left, train=train) + \
            dws_branch_k7_s2_p3(mid, "comb1_right", stem=True)(
                x_right, train=train)
        x2 = nasnet_avgpool3x3_s2()(x_left) + \
            dws_branch_k5_s2_p2(mid, "comb2_right", stem=True)(
                x_right, train=train)
        x3 = x1 + nasnet_avgpool3x3_s1()(x0)
        x4 = dws_branch_k3_s1_p1(mid, "comb4_left")(x0, train=train) + \
            NasMaxPoolBlock(name="comb4_right")(x_left, train=train)
        return jnp.concatenate([x1, x2, x3, x4], axis=-1)


class Stem2Unit(nn.Module):
    """Stem2 cell (reference nasnet.py:723)."""

    out_channels: int = 0
    extra_padding: bool = False

    @nn.compact
    def __call__(self, x, x_prev=None, train: bool = False):
        mid = self.out_channels // 4
        ep = self.extra_padding
        x_left = nas_conv1x1(mid, "conv1x1")(x, train=train)
        x_right = NasPathBlock(out_channels=mid, name="path")(
            x_prev, train=train)
        x0 = dws_branch_k5_s2_p2(mid, "comb0_left", extra_padding=ep)(
            x_left, train=train) + \
            dws_branch_k7_s2_p3(mid, "comb0_right", extra_padding=ep)(
                x_right, train=train)
        x1 = NasMaxPoolBlock(extra_padding=ep, name="comb1_left")(
            x_left, train=train) + \
            dws_branch_k7_s2_p3(mid, "comb1_right", extra_padding=ep)(
                x_right, train=train)
        x2 = NasAvgPoolBlock(extra_padding=ep, name="comb2_left")(
            x_left, train=train) + \
            dws_branch_k5_s2_p2(mid, "comb2_right", extra_padding=ep)(
                x_right, train=train)
        x3 = x1 + nasnet_avgpool3x3_s1()(x0)
        x4 = dws_branch_k3_s1_p1(mid, "comb4_left", extra_padding=ep)(
            x0, train=train) + \
            NasMaxPoolBlock(extra_padding=ep, name="comb4_right")(
                x_left, train=train)
        return jnp.concatenate([x1, x2, x3, x4], axis=-1)


class FirstUnit(nn.Module):
    """First cell of a stage (reference nasnet.py:805)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, x_prev=None, train: bool = False):
        mid = self.out_channels // 6
        x_left = nas_conv1x1(mid, "conv1x1")(x, train=train)
        x_right = NasPathBlock(out_channels=mid, name="path")(
            x_prev, train=train)
        x0 = dws_branch_k5_s1_p2(mid, "comb0_left")(x_left, train=train) + \
            dws_branch_k3_s1_p1(mid, "comb0_right")(x_right, train=train)
        x1 = dws_branch_k5_s1_p2(mid, "comb1_left")(x_right, train=train) + \
            dws_branch_k3_s1_p1(mid, "comb1_right")(x_right, train=train)
        x2 = nasnet_avgpool3x3_s1()(x_left) + x_right
        x3 = nasnet_avgpool3x3_s1()(x_right) + \
            nasnet_avgpool3x3_s1()(x_right)
        x4 = dws_branch_k3_s1_p1(mid, "comb4_left")(x_left, train=train) + \
            x_left
        return jnp.concatenate([x_right, x0, x1, x2, x3, x4], axis=-1)


class NormalUnit(nn.Module):
    """Normal cell (reference nasnet.py:875)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, x_prev=None, train: bool = False):
        mid = self.out_channels // 6
        x_left = nas_conv1x1(mid, "conv1x1")(x, train=train)
        x_right = nas_conv1x1(mid, "conv1x1_prev")(x_prev, train=train)
        x0 = dws_branch_k5_s1_p2(mid, "comb0_left")(x_left, train=train) + \
            dws_branch_k3_s1_p1(mid, "comb0_right")(x_right, train=train)
        x1 = dws_branch_k5_s1_p2(mid, "comb1_left")(x_right, train=train) + \
            dws_branch_k3_s1_p1(mid, "comb1_right")(x_right, train=train)
        x2 = nasnet_avgpool3x3_s1()(x_left) + x_right
        x3 = nasnet_avgpool3x3_s1()(x_right) + \
            nasnet_avgpool3x3_s1()(x_right)
        x4 = dws_branch_k3_s1_p1(mid, "comb4_left")(x_left, train=train) + \
            x_left
        return jnp.concatenate([x_right, x0, x1, x2, x3, x4], axis=-1)


class ReductionBaseUnit(nn.Module):
    """Reduction cell (reference nasnet.py:948). ``skip_input`` makes the
    enclosing dual-path container keep x_prev."""

    out_channels: int = 0
    extra_padding: bool = True
    skip_input: bool = True

    @nn.compact
    def __call__(self, x, x_prev=None, train: bool = False):
        mid = self.out_channels // 4
        ep = self.extra_padding
        x_left = nas_conv1x1(mid, "conv1x1")(x, train=train)
        x_right = nas_conv1x1(mid, "conv1x1_prev")(x_prev, train=train)
        x0 = dws_branch_k5_s2_p2(mid, "comb0_left", extra_padding=ep)(
            x_left, train=train) + \
            dws_branch_k7_s2_p3(mid, "comb0_right", extra_padding=ep)(
                x_right, train=train)
        x1 = NasMaxPoolBlock(extra_padding=ep, name="comb1_left")(
            x_left, train=train) + \
            dws_branch_k7_s2_p3(mid, "comb1_right", extra_padding=ep)(
                x_right, train=train)
        x2 = NasAvgPoolBlock(extra_padding=ep, name="comb2_left")(
            x_left, train=train) + \
            dws_branch_k5_s2_p2(mid, "comb2_right", extra_padding=ep)(
                x_right, train=train)
        x3 = x1 + nasnet_avgpool3x3_s1()(x0)
        x4 = dws_branch_k3_s1_p1(mid, "comb4_left", extra_padding=ep)(
            x0, train=train) + \
            NasMaxPoolBlock(extra_padding=ep, name="comb4_right")(
                x_left, train=train)
        return jnp.concatenate([x1, x2, x3, x4], axis=-1)


class NASNetInitBlock(nn.Module):
    """3x3/2 valid conv + BN (reference nasnet.py:1086)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv2d(self.out_channels, 3, stride=2, padding=0, bias=False,
                    name="conv")(x)
        return nasnet_batch_norm()(x, train=train)


class NASNet(nn.Module):
    """NASNet-A (reference nasnet.py:1121)."""

    channels: Any = ()
    init_block_channels: int = 32
    stem_blocks_channels: Tuple[int, int] = (44, 88)
    final_pool_size: int = 7
    extra_padding: bool = True
    skip_reduction_layer_input: bool = False
    in_channels: int = 3
    in_size: Tuple[int, int] = (224, 224)
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        layers = [
            NASNetInitBlock(out_channels=self.init_block_channels,
                            name="init_block", parent=None),
            Stem1Unit(out_channels=self.stem_blocks_channels[0],
                      name="stem1_unit", parent=None),
            Stem2Unit(out_channels=self.stem_blocks_channels[1],
                      extra_padding=self.extra_padding, name="stem2_unit",
                      parent=None),
        ]
        for i, channels_per_stage in enumerate(self.channels):
            units = []
            for j, out_channels in enumerate(channels_per_stage):
                if (j == 0) and (i != 0):
                    if i == 1:
                        units.append(ReductionBaseUnit(
                            out_channels=out_channels, extra_padding=True,
                            name=f"unit{j + 1}", parent=None))
                    else:
                        units.append(ReductionBaseUnit(
                            out_channels=out_channels,
                            extra_padding=self.extra_padding,
                            name=f"unit{j + 1}", parent=None))
                elif ((i == 0) and (j == 0)) or ((i != 0) and (j == 1)):
                    units.append(FirstUnit(out_channels=out_channels,
                                           name=f"unit{j + 1}",
                                           parent=None))
                else:
                    units.append(NormalUnit(out_channels=out_channels,
                                            name=f"unit{j + 1}",
                                            parent=None))
            layers.append(NasDualPathSequential(
                layers=tuple(units),
                can_skip_input=self.skip_reduction_layer_input,
                name=f"stage{i + 1}", parent=None))
        layers.append(nn.relu)
        layers.append(avg_pool2d(kernel_size=self.final_pool_size,
                                 stride=1))
        x = NasDualPathSequential(layers=tuple(layers), return_two=False,
                                  first_ordinals=1, last_ordinals=2,
                                  name="features")(x, train=train)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dropout(rate=0.5, deterministic=not train)(x)
        return Sequential(layers=(
            nn.Dense(self.num_classes, kernel_init=dense_kernel_init,
                     name="fc", parent=None),
        ), name="output")(x, train=train)


def get_nasnet(repeat: int, penultimate_filters: int,
               init_block_channels: int, final_pool_size: int,
               extra_padding: bool, skip_reduction_layer_input: bool,
               in_size: Tuple[int, int], **kwargs) -> NASNet:
    """Config expander (reference nasnet.py:1243)."""
    stem_blocks_channels = [1, 2]
    reduct_channels = [[], [8], [16]]
    norm_channels = [6, 12, 24]
    channels = [rci + [nci] * repeat
                for rci, nci in zip(reduct_channels, norm_channels)]
    base_channel_chunk = penultimate_filters // channels[-1][-1]
    stem_blocks_channels = [ci * base_channel_chunk
                            for ci in stem_blocks_channels]
    channels = [[cij * base_channel_chunk for cij in ci] for ci in channels]
    return NASNet(channels=tuple(tuple(c) for c in channels),
                  init_block_channels=init_block_channels,
                  stem_blocks_channels=tuple(stem_blocks_channels),
                  final_pool_size=final_pool_size,
                  extra_padding=extra_padding,
                  skip_reduction_layer_input=skip_reduction_layer_input,
                  in_size=in_size, **kwargs)


@register_model("nasnet_4a1056")
def nasnet_4a1056(**kwargs):
    kwargs.setdefault("in_size", (224, 224))
    return get_nasnet(repeat=4, penultimate_filters=1056,
                      init_block_channels=32, final_pool_size=7,
                      extra_padding=True, skip_reduction_layer_input=False,
                      **kwargs)


@register_model("nasnet_6a4032")
def nasnet_6a4032(**kwargs):
    kwargs.setdefault("in_size", (331, 331))
    return get_nasnet(repeat=6, penultimate_filters=4032,
                      init_block_channels=96, final_pool_size=11,
                      extra_padding=False, skip_reduction_layer_input=True,
                      **kwargs)
