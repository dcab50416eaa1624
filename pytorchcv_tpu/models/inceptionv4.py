"""InceptionV4, TPU-native. Behavioral reference: pytorchcv
``models/inceptionv4.py`` (Conv3x3Branch:15, ConvSeq3x3Branch:44,
InceptionAUnit:110, ReductionAUnit:147, InceptionBUnit:176, ReductionBUnit:213,
InceptionCUnit:242, InceptBlock3a:287, InceptBlock4a:305, InceptBlock5a:335,
InceptInitBlock:353, InceptionV4:446, inceptionv4:556)."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import Concurrent, ConvBlock, Sequential, conv3x3_block, \
    global_avg_pool2d
from ..nn.base import Composed, dense_kernel_init
from ..nn.norm import lambda_batchnorm2d
from .inceptionv3 import (AvgPoolBranch, Conv1x1Branch, ConvSeqBranch,
                          DropoutDense, MaxPoolBranch, conv_seq_branch)
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["InceptionV4", "inceptionv4"]


class Conv3x3Branch(nn.Module):
    """Strided unpadded 3x3 block branch (reference inceptionv4.py:15)."""

    out_channels: int = 0
    normalization: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return conv3x3_block(out_channels=self.out_channels, stride=2,
                             padding=0, normalization=self.normalization,
                             name="conv")(x, train=train)


class ConvSeq3x3Branch(nn.Module):
    """Conv sequence forking into 1x3/3x1 tails of ``out_channels`` each
    (reference inceptionv4.py:44; differs from the v3 variant in that the
    tail width is independent of the last mid channel)."""

    out_channels: int = 0
    mid_channels_list: Tuple = ()
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
                     self.mid_channels_list, self.kernel_size_list,
                     self.strides_list, self.padding_list))]
        x = Sequential(layers=tuple(convs), name="conv_list")(x, train=train)
        y1 = ConvBlock(out_channels=self.out_channels, kernel_size=(1, 3),
                       padding=(0, 1), normalization=self.normalization,
                       name="conv1x3")(x, train=train)
        y2 = ConvBlock(out_channels=self.out_channels, kernel_size=(3, 1),
                       padding=(1, 0), normalization=self.normalization,
                       name="conv3x1")(x, train=train)
        return jnp.concatenate([y1, y2], axis=-1)


class InceptionAUnit(nn.Module):
    """Inception-A (reference inceptionv4.py:110)."""

    normalization: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        nm = self.normalization
        return Concurrent(layers=(
            Conv1x1Branch(out_channels=96, normalization=nm, name="branch1",
                          parent=None),
            conv_seq_branch((64, 96), (1, 3), (1, 1), (0, 1),
                            normalization=nm, name="branch2"),
            conv_seq_branch((64, 96, 96), (1, 3, 3), (1, 1, 1), (0, 1, 1),
                            normalization=nm, name="branch3"),
            AvgPoolBranch(out_channels=96, normalization=nm,
                          count_include_pad=False, name="branch4",
                          parent=None),
        ), name="branches")(x, train=train)


class ReductionAUnit(nn.Module):
    """Reduction-A (reference inceptionv4.py:147)."""

    normalization: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        nm = self.normalization
        return Concurrent(layers=(
            conv_seq_branch((384,), (3,), (2,), (0,), normalization=nm,
                            name="branch1"),
            conv_seq_branch((192, 224, 256), (1, 3, 3), (1, 1, 2), (0, 1, 0),
                            normalization=nm, name="branch2"),
            MaxPoolBranch(name="branch3", parent=None),
        ), name="branches")(x, train=train)


class InceptionBUnit(nn.Module):
    """Inception-B (reference inceptionv4.py:176)."""

    normalization: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        nm = self.normalization
        return Concurrent(layers=(
            Conv1x1Branch(out_channels=384, normalization=nm, name="branch1",
                          parent=None),
            conv_seq_branch((192, 224, 256), (1, (1, 7), (7, 1)), (1, 1, 1),
                            (0, (0, 3), (3, 0)), normalization=nm,
                            name="branch2"),
            conv_seq_branch((192, 192, 224, 224, 256),
                            (1, (7, 1), (1, 7), (7, 1), (1, 7)),
                            (1, 1, 1, 1, 1),
                            (0, (3, 0), (0, 3), (3, 0), (0, 3)),
                            normalization=nm, name="branch3"),
            AvgPoolBranch(out_channels=128, normalization=nm,
                          count_include_pad=False, name="branch4",
                          parent=None),
        ), name="branches")(x, train=train)


class ReductionBUnit(nn.Module):
    """Reduction-B (reference inceptionv4.py:213)."""

    normalization: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        nm = self.normalization
        return Concurrent(layers=(
            conv_seq_branch((192, 192), (1, 3), (1, 2), (0, 0),
                            normalization=nm, name="branch1"),
            conv_seq_branch((256, 256, 320, 320), (1, (1, 7), (7, 1), 3),
                            (1, 1, 1, 2), (0, (0, 3), (3, 0), 0),
                            normalization=nm, name="branch2"),
            MaxPoolBranch(name="branch3", parent=None),
        ), name="branches")(x, train=train)


class InceptionCUnit(nn.Module):
    """Inception-C (reference inceptionv4.py:242)."""

    normalization: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        nm = self.normalization
        return Concurrent(layers=(
            Conv1x1Branch(out_channels=256, normalization=nm, name="branch1",
                          parent=None),
            ConvSeq3x3Branch(out_channels=256, mid_channels_list=(384,),
                             kernel_size_list=(1,), strides_list=(1,),
                             padding_list=(0,), normalization=nm,
                             name="branch2", parent=None),
            ConvSeq3x3Branch(out_channels=256,
                             mid_channels_list=(384, 448, 512),
                             kernel_size_list=(1, (3, 1), (1, 3)),
                             strides_list=(1, 1, 1),
                             padding_list=(0, (1, 0), (0, 1)),
                             normalization=nm, name="branch3", parent=None),
            AvgPoolBranch(out_channels=256, normalization=nm,
                          count_include_pad=False, name="branch4",
                          parent=None),
        ), name="branches")(x, train=train)


class BranchBlock(Composed):
    """Named wrapper holding a ``branches`` Concurrent (matches the torch
    InceptBlock3a/4a/5a module nesting, reference inceptionv4.py:287-351)."""

    branch_layers: Tuple = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        return Concurrent(layers=self.branch_layers,
                          name="branches")(x, train=train)


class InceptInitBlock(nn.Module):
    """InceptionV4 stem with Mixed-3a/4a/5a (reference inceptionv4.py:353)."""

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
        # Mixed-3a (reference inceptionv4.py:287)
        x = BranchBlock(branch_layers=(
            MaxPoolBranch(name="branch1", parent=None),
            Conv3x3Branch(out_channels=96, normalization=nm, name="branch2",
                          parent=None),
        ), name="block1")(x, train=train)
        # Mixed-4a (reference inceptionv4.py:305)
        x = BranchBlock(branch_layers=(
            conv_seq_branch((64, 96), (1, 3), (1, 1), (0, 0),
                            normalization=nm, name="branch1"),
            conv_seq_branch((64, 64, 64, 96), (1, (1, 7), (7, 1), 3),
                            (1, 1, 1, 1), (0, (0, 3), (3, 0), 0),
                            normalization=nm, name="branch2"),
        ), name="block2")(x, train=train)
        # Mixed-5a (reference inceptionv4.py:335)
        x = BranchBlock(branch_layers=(
            Conv3x3Branch(out_channels=192, normalization=nm, name="branch1",
                          parent=None),
            MaxPoolBranch(name="branch2", parent=None),
        ), name="block3")(x, train=train)
        return x


def InceptionV4(dropout_rate: float = 0.0, bn_eps: float = 1e-5,
                in_channels: int = 3, in_size: Tuple[int, int] = (299, 299),
                num_classes: int = 1000) -> ImageClassifier:
    """InceptionV4 (reference inceptionv4.py:446)."""
    nm = lambda_batchnorm2d(eps=bn_eps)
    stage_layers = [4, 8, 4]
    normal_units = [InceptionAUnit, InceptionBUnit, InceptionCUnit]
    reduction_units = [ReductionAUnit, ReductionBUnit]
    layers = [InceptInitBlock(normalization=nm, name="init_block")]
    for i, layers_per_stage in enumerate(stage_layers):
        units = []
        for j in range(layers_per_stage):
            unit = reduction_units[i - 1] if (j == 0 and i != 0) \
                else normal_units[i]
            units.append(unit(normalization=nm, name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=DropoutDense(num_classes=num_classes,
                            dropout_rate=dropout_rate, name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


@register_model("inceptionv4")
def inceptionv4(**kwargs):
    return InceptionV4(bn_eps=1e-3, **kwargs)
