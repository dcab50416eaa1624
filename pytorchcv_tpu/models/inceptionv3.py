"""InceptionV3, TPU-native. Behavioral reference: pytorchcv
``models/inceptionv3.py`` (MaxPoolBranch:14, AvgPoolBranch:31, Conv1x1Branch:69,
ConvSeqBranch:95, ConvSeq3x3Branch:154, InceptionAUnit:224, ReductionAUnit:271,
InceptionBUnit:311, ReductionBUnit:366, InceptionCUnit:406, InceptInitBlock:461,
InceptionV3:531, get_inceptionv3:633). The branch vocabulary here is reused by
inceptionv4/inceptionresnet (as in the reference)."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (Concurrent, ConvBlock, Sequential, avg_pool2d,
                  conv1x1_block, conv3x3_block, global_avg_pool2d, max_pool2d)
from ..nn.base import dense_kernel_init
from ..nn.norm import lambda_batchnorm2d
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["InceptionV3", "get_inceptionv3", "MaxPoolBranch", "AvgPoolBranch",
           "Conv1x1Branch", "ConvSeqBranch", "conv_seq_branch"]


class MaxPoolBranch(nn.Module):
    """3x3 stride-2 max-pool branch (reference inceptionv3.py:14)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return max_pool2d(3, 2)(x)


class AvgPoolBranch(nn.Module):
    """3x3 avg-pool + 1x1 conv branch (reference inceptionv3.py:31)."""

    out_channels: int = 0
    normalization: Any = None
    count_include_pad: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = avg_pool2d(3, 1, padding=1,
                       count_include_pad=self.count_include_pad)(x)
        x = conv1x1_block(out_channels=self.out_channels,
                          normalization=self.normalization,
                          name="conv")(x, train=train)
        return x


class Conv1x1Branch(nn.Module):
    """1x1 conv branch (reference inceptionv3.py:69)."""

    out_channels: int = 0
    normalization: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return conv1x1_block(out_channels=self.out_channels,
                             normalization=self.normalization,
                             name="conv")(x, train=train)


class ConvSeqBranch(nn.Module):
    """Sequence of ConvBlocks (reference inceptionv3.py:95)."""

    out_channels_list: Tuple = ()
    kernel_size_list: Tuple = ()
    strides_list: Tuple = ()
    padding_list: Tuple = ()
    bias: bool = False
    normalization: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        convs = [ConvBlock(out_channels=oc, kernel_size=ks, stride=st,
                           padding=pd, bias=self.bias,
                           normalization=self.normalization,
                           name=f"conv{i + 1}", parent=None)
                 for i, (oc, ks, st, pd) in enumerate(zip(
                     self.out_channels_list, self.kernel_size_list,
                     self.strides_list, self.padding_list))]
        return Sequential(layers=tuple(convs),
                          name="conv_list")(x, train=train)


def conv_seq_branch(out_channels_list, kernel_size_list, strides_list,
                    padding_list, bias=False, normalization=None,
                    name="branch"):
    return ConvSeqBranch(
        out_channels_list=tuple(out_channels_list),
        kernel_size_list=tuple(kernel_size_list),
        strides_list=tuple(strides_list), padding_list=tuple(padding_list),
        bias=bias, normalization=normalization, name=name, parent=None)


class ConvSeq3x3Branch(nn.Module):
    """Conv sequence forking into parallel 1x3 and 3x1 tails
    (reference inceptionv3.py:154)."""

    out_channels_list: Tuple = ()
    kernel_size_list: Tuple = ()
    strides_list: Tuple = ()
    padding_list: Tuple = ()
    normalization: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        convs = [ConvBlock(out_channels=oc, kernel_size=ks, stride=st,
                           padding=pd, normalization=self.normalization,
                           name=f"conv{i + 1}", parent=None)
                 for i, (oc, ks, st, pd) in enumerate(zip(
                     self.out_channels_list, self.kernel_size_list,
                     self.strides_list, self.padding_list))]
        x = Sequential(layers=tuple(convs), name="conv_list")(x, train=train)
        mid = self.out_channels_list[-1]
        y1 = ConvBlock(out_channels=mid, kernel_size=(1, 3), padding=(0, 1),
                       normalization=self.normalization,
                       name="conv1x3")(x, train=train)
        y2 = ConvBlock(out_channels=mid, kernel_size=(3, 1), padding=(1, 0),
                       normalization=self.normalization,
                       name="conv3x1")(x, train=train)
        return jnp.concatenate([y1, y2], axis=-1)


class InceptionAUnit(nn.Module):
    """Inception-A (reference inceptionv3.py:224)."""

    out_channels: int = 0
    normalization: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        nm = self.normalization
        return Concurrent(layers=(
            Conv1x1Branch(out_channels=64, normalization=nm, name="branch1",
                          parent=None),
            conv_seq_branch((48, 64), (1, 5), (1, 1), (0, 2),
                            normalization=nm, name="branch2"),
            conv_seq_branch((64, 96, 96), (1, 3, 3), (1, 1, 1), (0, 1, 1),
                            normalization=nm, name="branch3"),
            AvgPoolBranch(out_channels=self.out_channels - 224,
                          normalization=nm, name="branch4", parent=None),
        ), name="branches")(x, train=train)


class ReductionAUnit(nn.Module):
    """Reduction-A (reference inceptionv3.py:271)."""

    normalization: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        nm = self.normalization
        return Concurrent(layers=(
            conv_seq_branch((384,), (3,), (2,), (0,), normalization=nm,
                            name="branch1"),
            conv_seq_branch((64, 96, 96), (1, 3, 3), (1, 1, 2), (0, 1, 0),
                            normalization=nm, name="branch2"),
            MaxPoolBranch(name="branch3", parent=None),
        ), name="branches")(x, train=train)


class InceptionBUnit(nn.Module):
    """Inception-B (reference inceptionv3.py:311)."""

    mid_channels: int = 0
    normalization: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        nm = self.normalization
        mc = self.mid_channels
        return Concurrent(layers=(
            Conv1x1Branch(out_channels=192, normalization=nm, name="branch1",
                          parent=None),
            conv_seq_branch((mc, mc, 192), (1, (1, 7), (7, 1)), (1, 1, 1),
                            (0, (0, 3), (3, 0)), normalization=nm,
                            name="branch2"),
            conv_seq_branch((mc, mc, mc, mc, 192),
                            (1, (7, 1), (1, 7), (7, 1), (1, 7)),
                            (1, 1, 1, 1, 1),
                            (0, (3, 0), (0, 3), (3, 0), (0, 3)),
                            normalization=nm, name="branch3"),
            AvgPoolBranch(out_channels=192, normalization=nm, name="branch4",
                          parent=None),
        ), name="branches")(x, train=train)


class ReductionBUnit(nn.Module):
    """Reduction-B (reference inceptionv3.py:366)."""

    normalization: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        nm = self.normalization
        return Concurrent(layers=(
            conv_seq_branch((192, 320), (1, 3), (1, 2), (0, 0),
                            normalization=nm, name="branch1"),
            conv_seq_branch((192, 192, 192, 192), (1, (1, 7), (7, 1), 3),
                            (1, 1, 1, 2), (0, (0, 3), (3, 0), 0),
                            normalization=nm, name="branch2"),
            MaxPoolBranch(name="branch3", parent=None),
        ), name="branches")(x, train=train)


class InceptionCUnit(nn.Module):
    """Inception-C (reference inceptionv3.py:406)."""

    normalization: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        nm = self.normalization
        return Concurrent(layers=(
            Conv1x1Branch(out_channels=320, normalization=nm, name="branch1",
                          parent=None),
            ConvSeq3x3Branch(out_channels_list=(384,), kernel_size_list=(1,),
                             strides_list=(1,), padding_list=(0,),
                             normalization=nm, name="branch2", parent=None),
            ConvSeq3x3Branch(out_channels_list=(448, 384),
                             kernel_size_list=(1, 3), strides_list=(1, 1),
                             padding_list=(0, 1), normalization=nm,
                             name="branch3", parent=None),
            AvgPoolBranch(out_channels=192, normalization=nm, name="branch4",
                          parent=None),
        ), name="branches")(x, train=train)


class InceptInitBlock(nn.Module):
    """InceptionV3 stem (reference inceptionv3.py:461)."""

    normalization: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        nm = self.normalization
        x = conv3x3_block(out_channels=32, stride=2, padding=0,
                          normalization=nm, name="conv1")(x, train=train)
        x = conv3x3_block(out_channels=32, padding=0, normalization=nm,
                          name="conv2")(x, train=train)
        x = conv3x3_block(out_channels=64, padding=1, normalization=nm,
                          name="conv3")(x, train=train)
        x = max_pool2d(3, 2)(x)
        x = conv1x1_block(out_channels=80, normalization=nm,
                          name="conv4")(x, train=train)
        x = conv3x3_block(out_channels=192, padding=0, normalization=nm,
                          name="conv5")(x, train=train)
        x = max_pool2d(3, 2)(x)
        return x


class DropoutDense(nn.Module):
    """dropout + fc head (reference inceptionv3.py:607-613 ``output``)."""

    num_classes: int = 1000
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dropout(rate=self.dropout_rate, deterministic=not train)(x)
        return nn.Dense(self.num_classes, kernel_init=dense_kernel_init,
                        name="fc")(x)


def InceptionV3(channels, init_block_channels: int, b_mid_channels,
                bn_eps: float = 1e-5, dropout_rate: float = 0.5,
                in_channels: int = 3, in_size: Tuple[int, int] = (299, 299),
                num_classes: int = 1000) -> ImageClassifier:
    """InceptionV3 (reference inceptionv3.py:531)."""
    nm = lambda_batchnorm2d(eps=bn_eps)
    normal_units = [InceptionAUnit, InceptionBUnit, InceptionCUnit]
    reduction_units = [ReductionAUnit, ReductionBUnit]
    layers = [InceptInitBlock(normalization=nm, name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            if (j == 0) and (i != 0):
                unit = reduction_units[i - 1]
                units.append(unit(normalization=nm, name=f"unit{j + 1}"))
            elif normal_units[i] is InceptionAUnit:
                units.append(InceptionAUnit(out_channels=out_channels,
                                            normalization=nm,
                                            name=f"unit{j + 1}"))
            elif normal_units[i] is InceptionBUnit:
                units.append(InceptionBUnit(mid_channels=b_mid_channels[j - 1],
                                            normalization=nm,
                                            name=f"unit{j + 1}"))
            else:
                units.append(InceptionCUnit(normalization=nm,
                                            name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=DropoutDense(num_classes=num_classes,
                            dropout_rate=dropout_rate, name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_inceptionv3(**kwargs):
    """Config expander (reference inceptionv3.py:633)."""
    init_block_channels = 192
    channels = [[256, 288, 288], [768, 768, 768, 768, 768],
                [1280, 2048, 2048]]
    b_mid_channels = [128, 160, 160, 192]
    return InceptionV3(channels=channels,
                       init_block_channels=init_block_channels,
                       b_mid_channels=b_mid_channels, **kwargs)


@register_model("inceptionv3")
def inceptionv3(**kwargs):
    return get_inceptionv3(bn_eps=1e-3, **kwargs)
