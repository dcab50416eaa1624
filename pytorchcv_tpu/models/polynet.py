"""PolyNet for ImageNet-1K, TPU-native (JAX/flax, NHWC).

Behavioral reference: pytorchcv ``models/polynet.py`` (PolyConv:15,
MaxPoolBranch:81, Conv1x1Branch:100, Conv3x3Branch:129, ConvSeqBranch:158,
PolyConvSeqBranch:212, TwoWayABlock:270, TwoWayBBlock:313,
TwoWayCBlock:350, PolyPreBBlock:387, PolyPreCBlock:425,
poly_res_b_block:463, poly_res_c_block:475, MultiResidual:487,
PolyResidual:521, PolyBaseUnit:565, PolyAUnit:610, PolyBUnit:629,
PolyCUnit:650, ReductionAUnit:671, ReductionBUnit:708, PolyBlock3a:420,
PolyBlock4a:433, PolyBlock5a:462, PolyInitBlock:489, PolyNet:536,
get_polynet:644) from 'PolyNet: A Pursuit of Structural Diversity in Very
Deep Networks' https://arxiv.org/abs/1611.05725.

Poly-3 modules share ONE conv weight across the three residual passes but
keep a BatchNorm per pass — expressed as a conv submodule called three
times plus an indexed BN list (matches the torch ``bns.{i}`` scopes)."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (BatchNorm, Concurrent, ConvBlock, Sequential, avg_pool2d,
                  conv1x1_block, conv3x3_block, lambda_batchnorm2d,
                  max_pool2d)
from ..nn.arch import IndexedSeq
from ..nn.base import IntPair, dense_kernel_init
from ..nn.conv import _conv2d
from .registry import register_model

__all__ = ["PolyNet", "get_polynet"]


class PolyConv(nn.Module):
    """Shared conv + per-pass BN + ReLU (reference polynet.py:15)."""

    out_channels: int = 0
    kernel_size: IntPair = 1
    stride: IntPair = 1
    padding: IntPair = 0
    num_blocks: int = 3

    @nn.compact
    def __call__(self, x, index: int = 0, train: bool = False):
        x = _conv2d(self.out_channels, self.kernel_size, stride=self.stride,
                    padding=self.padding, bias=False, name="conv")(x)
        bns = IndexedSeq(layers=tuple(
            BatchNorm(name=str(i), parent=None)
            for i in range(self.num_blocks)), name="bns")
        x = bns(x, index, train=train)
        return nn.relu(x)


def poly_conv1x1(out_channels, num_blocks, name):
    return PolyConv(out_channels=out_channels, kernel_size=1, stride=1,
                    padding=0, num_blocks=num_blocks, name=name,
                    parent=None)


class MaxPoolBranch(nn.Module):
    """maxpool3x3/2 valid (reference polynet.py:81)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        return max_pool2d(kernel_size=3, stride=2, padding=0)(x)


class Conv1x1Branch(nn.Module):
    """1x1 conv block (reference polynet.py:100)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        return conv1x1_block(out_channels=self.out_channels, name="conv")(
            x, train=train)


class Conv3x3Branch(nn.Module):
    """3x3/2 valid conv block (reference polynet.py:129)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        return conv3x3_block(out_channels=self.out_channels, stride=2,
                             padding=0, name="conv")(x, train=train)


class ConvSeqBranch(nn.Module):
    """Sequence of standard ConvBlocks (reference polynet.py:158)."""

    out_channels_list: Any = ()
    kernel_size_list: Any = ()
    strides_list: Any = ()
    padding_list: Any = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        convs = [ConvBlock(out_channels=oc, kernel_size=ks, stride=st,
                           padding=pd, name=f"conv{i + 1}", parent=None)
                 for i, (oc, ks, st, pd) in enumerate(zip(
                     self.out_channels_list, self.kernel_size_list,
                     self.strides_list, self.padding_list))]
        return Sequential(layers=tuple(convs), name="conv_list")(
            x, train=train)


class PolyConvSeqBranch(nn.Module):
    """Sequence of PolyConvs, one shared index (reference
    polynet.py:212)."""

    out_channels_list: Any = ()
    kernel_size_list: Any = ()
    strides_list: Any = ()
    padding_list: Any = ()
    num_blocks: int = 3

    @nn.compact
    def __call__(self, x, index: int = 0, train: bool = False):
        convs = [PolyConv(out_channels=oc, kernel_size=ks, stride=st,
                          padding=pd, num_blocks=self.num_blocks,
                          name=f"conv{i + 1}", parent=None)
                 for i, (oc, ks, st, pd) in enumerate(zip(
                     self.out_channels_list, self.kernel_size_list,
                     self.strides_list, self.padding_list))]
        seq = IndexedSeq(layers=tuple(convs), name="conv_list")
        for i in range(len(convs)):
            x = seq(x, i, index=index, train=train)
        return x


class TwoWayABlock(nn.Module):
    """Inception-A block (reference polynet.py:270)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = 384
        x = Concurrent(layers=(
            ConvSeqBranch(out_channels_list=(32, 48, 64),
                          kernel_size_list=(1, 3, 3),
                          strides_list=(1, 1, 1), padding_list=(0, 1, 1),
                          name="branch1", parent=None),
            ConvSeqBranch(out_channels_list=(32, 32),
                          kernel_size_list=(1, 3), strides_list=(1, 1),
                          padding_list=(0, 1), name="branch2", parent=None),
            Conv1x1Branch(out_channels=32, name="branch3", parent=None),
        ), name="branches")(x, train=train)
        return conv1x1_block(out_channels=in_channels, activation=None,
                             name="conv")(x, train=train)


class TwoWayBBlock(nn.Module):
    """Inception-B block (reference polynet.py:313)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = 1152
        x = Concurrent(layers=(
            ConvSeqBranch(out_channels_list=(128, 160, 192),
                          kernel_size_list=(1, (1, 7), (7, 1)),
                          strides_list=(1, 1, 1),
                          padding_list=(0, (0, 3), (3, 0)),
                          name="branch1", parent=None),
            Conv1x1Branch(out_channels=192, name="branch2", parent=None),
        ), name="branches")(x, train=train)
        return conv1x1_block(out_channels=in_channels, activation=None,
                             name="conv")(x, train=train)


class TwoWayCBlock(nn.Module):
    """Inception-C block (reference polynet.py:350)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = 2048
        x = Concurrent(layers=(
            ConvSeqBranch(out_channels_list=(192, 224, 256),
                          kernel_size_list=(1, (1, 3), (3, 1)),
                          strides_list=(1, 1, 1),
                          padding_list=(0, (0, 1), (1, 0)),
                          name="branch1", parent=None),
            Conv1x1Branch(out_channels=192, name="branch2", parent=None),
        ), name="branches")(x, train=train)
        return conv1x1_block(out_channels=in_channels, activation=None,
                             name="conv")(x, train=train)


class PolyPreBBlock(nn.Module):
    """PolyResidual-Pre-B (reference polynet.py:387)."""

    num_blocks: int = 3

    @nn.compact
    def __call__(self, x, index: int = 0, train: bool = False):
        seq = IndexedSeq(layers=(
            PolyConvSeqBranch(
                out_channels_list=(128, 160, 192),
                kernel_size_list=(1, (1, 7), (7, 1)),
                strides_list=(1, 1, 1), padding_list=(0, (0, 3), (3, 0)),
                num_blocks=self.num_blocks, name="branch1", parent=None),
            PolyConv(out_channels=192, kernel_size=1, padding=0,
                     num_blocks=self.num_blocks, name="branch2",
                     parent=None),
        ), name="branches")
        return jnp.concatenate([seq(x, 0, index=index, train=train),
                                seq(x, 1, index=index, train=train)],
                               axis=-1)


class PolyPreCBlock(nn.Module):
    """PolyResidual-Pre-C (reference polynet.py:425)."""

    num_blocks: int = 3

    @nn.compact
    def __call__(self, x, index: int = 0, train: bool = False):
        seq = IndexedSeq(layers=(
            PolyConvSeqBranch(
                out_channels_list=(192, 224, 256),
                kernel_size_list=(1, (1, 3), (3, 1)),
                strides_list=(1, 1, 1), padding_list=(0, (0, 1), (1, 0)),
                num_blocks=self.num_blocks, name="branch1", parent=None),
            PolyConv(out_channels=192, kernel_size=1, padding=0,
                     num_blocks=self.num_blocks, name="branch2",
                     parent=None),
        ), name="branches")
        return jnp.concatenate([seq(x, 0, index=index, train=train),
                                seq(x, 1, index=index, train=train)],
                               axis=-1)


class MultiResidual(nn.Module):
    """2-way residual: out = relu(x + s*b1(x) + s*b2(x)) (reference
    polynet.py:487)."""

    scale: float = 1.0
    res_block: Any = None
    num_blocks: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        blocks = IndexedSeq(layers=tuple(
            self.res_block(name=str(i), parent=None)
            for i in range(self.num_blocks)), name="res_blocks")
        out = x
        for i in range(self.num_blocks):
            out = out + self.scale * blocks(x, i, train=train)
        return nn.relu(out)


class PolyResidual(nn.Module):
    """3-way poly residual with shared pre-block (reference
    polynet.py:521)."""

    scale: float = 1.0
    res_block: Any = None
    num_blocks: int = 3
    pre_block: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pre = self.pre_block(num_blocks=self.num_blocks, name="pre_block")
        blocks = IndexedSeq(layers=tuple(
            self.res_block(name=str(i), parent=None)
            for i in range(self.num_blocks)), name="res_blocks")
        out = x
        for i in range(self.num_blocks):
            x = pre(x, index=i, train=train)
            x = blocks(x, i, train=train)
            out = out + self.scale * x
            x = nn.relu(x)
        return nn.relu(out)


def poly_res_b_block(name, parent="unset"):
    kw = {} if parent == "unset" else {"parent": parent}
    return conv1x1_block(out_channels=1152, stride=1, activation=None,
                         name=name, **kw)


def poly_res_c_block(name, parent="unset"):
    kw = {} if parent == "unset" else {"parent": parent}
    return conv1x1_block(out_channels=2048, stride=1, activation=None,
                         name=name, **kw)


class PolyBaseUnit(nn.Module):
    """Optional poly-3 stage + 2-way stage (reference polynet.py:565)."""

    two_way_scale: float = 1.0
    two_way_block: Any = None
    poly_scale: float = 0.0
    poly_res_block: Any = None
    poly_pre_block: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.poly_res_block is not None:
            x = PolyResidual(scale=self.poly_scale,
                             res_block=self.poly_res_block, num_blocks=3,
                             pre_block=self.poly_pre_block, name="poly")(
                                 x, train=train)
        x = MultiResidual(scale=self.two_way_scale,
                          res_block=self.two_way_block, num_blocks=2,
                          name="twoway")(x, train=train)
        return x


def PolyAUnit(two_way_scale, poly_scale=0.0, name=None, parent="unset"):
    assert poly_scale == 0.0
    kw = {} if parent == "unset" else {"parent": parent}
    return PolyBaseUnit(two_way_scale=two_way_scale,
                        two_way_block=TwoWayABlock, name=name, **kw)


def PolyBUnit(two_way_scale, poly_scale, name=None, parent="unset"):
    kw = {} if parent == "unset" else {"parent": parent}
    return PolyBaseUnit(two_way_scale=two_way_scale,
                        two_way_block=TwoWayBBlock, poly_scale=poly_scale,
                        poly_res_block=poly_res_b_block,
                        poly_pre_block=PolyPreBBlock, name=name, **kw)


def PolyCUnit(two_way_scale, poly_scale, name=None, parent="unset"):
    kw = {} if parent == "unset" else {"parent": parent}
    return PolyBaseUnit(two_way_scale=two_way_scale,
                        two_way_block=TwoWayCBlock, poly_scale=poly_scale,
                        poly_res_block=poly_res_c_block,
                        poly_pre_block=PolyPreCBlock, name=name, **kw)


class ReductionAUnit(nn.Module):
    """Reduction-A (reference polynet.py:671)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return Concurrent(layers=(
            ConvSeqBranch(out_channels_list=(256, 256, 384),
                          kernel_size_list=(1, 3, 3),
                          strides_list=(1, 1, 2), padding_list=(0, 1, 0),
                          name="branch1", parent=None),
            ConvSeqBranch(out_channels_list=(384,), kernel_size_list=(3,),
                          strides_list=(2,), padding_list=(0,),
                          name="branch2", parent=None),
            MaxPoolBranch(),
        ), name="branches")(x, train=train)


class ReductionBUnit(nn.Module):
    """Reduction-B (reference polynet.py:708)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return Concurrent(layers=(
            ConvSeqBranch(out_channels_list=(256, 256, 256),
                          kernel_size_list=(1, 3, 3),
                          strides_list=(1, 1, 2), padding_list=(0, 1, 0),
                          name="branch1", parent=None),
            ConvSeqBranch(out_channels_list=(256, 256),
                          kernel_size_list=(1, 3), strides_list=(1, 2),
                          padding_list=(0, 0), name="branch2", parent=None),
            ConvSeqBranch(out_channels_list=(256, 384),
                          kernel_size_list=(1, 3), strides_list=(1, 2),
                          padding_list=(0, 0), name="branch3", parent=None),
            MaxPoolBranch(),
        ), name="branches")(x, train=train)


class PolyBlock3a(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return Concurrent(layers=(
            MaxPoolBranch(),
            Conv3x3Branch(out_channels=96, name="branch2", parent=None),
        ), name="branches")(x, train=train)


class PolyBlock4a(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return Concurrent(layers=(
            ConvSeqBranch(out_channels_list=(64, 96),
                          kernel_size_list=(1, 3), strides_list=(1, 1),
                          padding_list=(0, 0), name="branch1", parent=None),
            ConvSeqBranch(out_channels_list=(64, 64, 64, 96),
                          kernel_size_list=(1, (7, 1), (1, 7), 3),
                          strides_list=(1, 1, 1, 1),
                          padding_list=(0, (3, 0), (0, 3), 0),
                          name="branch2", parent=None),
        ), name="branches")(x, train=train)


class PolyBlock5a(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return Concurrent(layers=(
            MaxPoolBranch(),
            Conv3x3Branch(out_channels=192, name="branch2", parent=None),
        ), name="branches")(x, train=train)


class PolyInitBlock(nn.Module):
    """Inception-v4-style stem (reference polynet.py:489)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=32, stride=2, padding=0,
                          name="conv1")(x, train=train)
        x = conv3x3_block(out_channels=32, padding=0, name="conv2")(
            x, train=train)
        x = conv3x3_block(out_channels=64, name="conv3")(x, train=train)
        x = PolyBlock3a(name="block1")(x, train=train)
        x = PolyBlock4a(name="block2")(x, train=train)
        return PolyBlock5a(name="block3")(x, train=train)


class PolyNet(nn.Module):
    """PolyNet (reference polynet.py:536)."""

    two_way_scales: Any = ()
    poly_scales: Any = ()
    dropout_rate: float = 0.2
    in_channels: int = 3
    in_size: Tuple[int, int] = (331, 331)
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        normal_units = [PolyAUnit, PolyBUnit, PolyCUnit]
        reduction_units = [ReductionAUnit, ReductionBUnit]
        layers = [PolyInitBlock(name="init_block", parent=None)]
        for i, (tws, ps) in enumerate(zip(self.two_way_scales,
                                          self.poly_scales)):
            units = []
            for j, (two_way_scale, poly_scale) in enumerate(zip(tws, ps)):
                if (j == 0) and (i != 0):
                    units.append(reduction_units[i - 1](
                        name=f"unit{j + 1}", parent=None))
                else:
                    units.append(normal_units[i](
                        two_way_scale=two_way_scale,
                        poly_scale=poly_scale, name=f"unit{j + 1}",
                        parent=None))
            layers.append(Sequential(layers=tuple(units),
                                     name=f"stage{i + 1}", parent=None))
        layers.append(avg_pool2d(kernel_size=9, stride=1))
        x = Sequential(layers=tuple(layers), name="features")(
            x, train=train)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dropout(rate=self.dropout_rate,
                       deterministic=not train)(x)
        return Sequential(layers=(
            nn.Dense(self.num_classes, kernel_init=dense_kernel_init,
                     name="fc", parent=None),
        ), name="output")(x, train=train)


def get_polynet(**kwargs) -> PolyNet:
    """Config expander (reference polynet.py:644)."""
    two_way_scales = [
        [1.000000, 0.992308, 0.984615, 0.976923, 0.969231, 0.961538,
         0.953846, 0.946154, 0.938462, 0.930769],
        [0.000000, 0.915385, 0.900000, 0.884615, 0.869231, 0.853846,
         0.838462, 0.823077, 0.807692, 0.792308, 0.776923],
        [0.000000, 0.761538, 0.746154, 0.730769, 0.715385, 0.700000]]
    poly_scales = [
        [0.000000, 0.000000, 0.000000, 0.000000, 0.000000, 0.000000,
         0.000000, 0.000000, 0.000000, 0.000000],
        [0.000000, 0.923077, 0.907692, 0.892308, 0.876923, 0.861538,
         0.846154, 0.830769, 0.815385, 0.800000, 0.784615],
        [0.000000, 0.769231, 0.753846, 0.738462, 0.723077, 0.707692]]
    return PolyNet(two_way_scales=tuple(tuple(s) for s in two_way_scales),
                   poly_scales=tuple(tuple(s) for s in poly_scales),
                   **kwargs)


@register_model("polynet")
def polynet(**kwargs):
    return get_polynet(**kwargs)
