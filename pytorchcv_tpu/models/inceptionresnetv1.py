"""InceptionResNetV1, TPU-native. Behavioral reference: pytorchcv
``models/inceptionresnetv1.py`` (InceptionAUnit:14, InceptionBUnit:74,
InceptionCUnit:125, ReductionAUnit:185, ReductionBUnit:223, InceptInitBlock:270,
InceptHead:341, InceptionResNetV1:391). Units are reused by
inceptionresnetv2 (as in the reference)."""

from __future__ import annotations

from typing import Any, Tuple

from flax import linen as nn

from ..nn import BatchNorm, Concurrent, Sequential, conv1x1_block, \
    conv3x3_block, global_avg_pool2d, max_pool2d
from ..nn.base import conv_kernel_init, dense_kernel_init
from ..nn.norm import lambda_batchnorm2d
from .inceptionv3 import Conv1x1Branch, MaxPoolBranch, conv_seq_branch
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["InceptionResNetV1", "InceptionAUnit", "InceptionBUnit",
           "InceptionCUnit", "ReductionAUnit", "ReductionBUnit"]


def _conv1x1_bias(out_channels, name):
    return nn.Conv(out_channels, (1, 1), use_bias=True,
                   kernel_init=conv_kernel_init, name=name)


class InceptionAUnit(nn.Module):
    """Residual Inception-A with 0.17 scale (reference
    inceptionresnetv1.py:14)."""

    in_channels: int = 0
    out_channels_list: Tuple = ()
    normalization: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        nm = self.normalization
        ocl = self.out_channels_list
        identity = x
        x = Concurrent(layers=(
            Conv1x1Branch(out_channels=ocl[0], normalization=nm,
                          name="branch1", parent=None),
            conv_seq_branch(ocl[1:3], (1, 3), (1, 1), (0, 1),
                            normalization=nm, name="branch2"),
            conv_seq_branch(ocl[3:6], (1, 3, 3), (1, 1, 1), (0, 1, 1),
                            normalization=nm, name="branch3"),
        ), name="branches")(x, train=train)
        x = _conv1x1_bias(self.in_channels, "conv")(x)
        return nn.relu(0.17 * x + identity)


class InceptionBUnit(nn.Module):
    """Residual Inception-B with 0.10 scale (reference
    inceptionresnetv1.py:74)."""

    in_channels: int = 0
    out_channels_list: Tuple = ()
    normalization: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        nm = self.normalization
        ocl = self.out_channels_list
        identity = x
        x = Concurrent(layers=(
            Conv1x1Branch(out_channels=ocl[0], normalization=nm,
                          name="branch1", parent=None),
            conv_seq_branch(ocl[1:4], (1, (1, 7), (7, 1)), (1, 1, 1),
                            (0, (0, 3), (3, 0)), normalization=nm,
                            name="branch2"),
        ), name="branches")(x, train=train)
        x = _conv1x1_bias(self.in_channels, "conv")(x)
        return nn.relu(0.10 * x + identity)


class InceptionCUnit(nn.Module):
    """Residual Inception-C (reference inceptionresnetv1.py:125)."""

    in_channels: int = 0
    out_channels_list: Tuple = ()
    normalization: Any = None
    scale: float = 0.2
    activate: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        nm = self.normalization
        ocl = self.out_channels_list
        identity = x
        x = Concurrent(layers=(
            Conv1x1Branch(out_channels=ocl[0], normalization=nm,
                          name="branch1", parent=None),
            conv_seq_branch(ocl[1:4], (1, (1, 3), (3, 1)), (1, 1, 1),
                            (0, (0, 1), (1, 0)), normalization=nm,
                            name="branch2"),
        ), name="branches")(x, train=train)
        x = _conv1x1_bias(self.in_channels, "conv")(x)
        x = self.scale * x + identity
        if self.activate:
            x = nn.relu(x)
        return x


class ReductionAUnit(nn.Module):
    """Reduction-A (reference inceptionresnetv1.py:185)."""

    in_channels: int = 0
    out_channels_list: Tuple = ()
    normalization: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        nm = self.normalization
        ocl = self.out_channels_list
        return Concurrent(layers=(
            conv_seq_branch(ocl[0:1], (3,), (2,), (0,), normalization=nm,
                            name="branch1"),
            conv_seq_branch(ocl[1:4], (1, 3, 3), (1, 1, 2), (0, 1, 0),
                            normalization=nm, name="branch2"),
            MaxPoolBranch(name="branch3", parent=None),
        ), name="branches")(x, train=train)


class ReductionBUnit(nn.Module):
    """Reduction-B (reference inceptionresnetv1.py:223)."""

    in_channels: int = 0
    out_channels_list: Tuple = ()
    normalization: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        nm = self.normalization
        ocl = self.out_channels_list
        return Concurrent(layers=(
            conv_seq_branch(ocl[0:2], (1, 3), (1, 2), (0, 0),
                            normalization=nm, name="branch1"),
            conv_seq_branch(ocl[2:4], (1, 3), (1, 2), (0, 0),
                            normalization=nm, name="branch2"),
            conv_seq_branch(ocl[4:7], (1, 3, 3), (1, 1, 2), (0, 1, 0),
                            normalization=nm, name="branch3"),
            MaxPoolBranch(name="branch4", parent=None),
        ), name="branches")(x, train=train)


class InceptInitBlock(nn.Module):
    """InceptionResNetV1 stem (reference inceptionresnetv1.py:270)."""

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
        x = conv3x3_block(out_channels=256, stride=2, padding=0,
                          normalization=nm, name="conv6")(x, train=train)
        return x


class InceptHead(nn.Module):
    """dropout + fc1(no bias) + BN1d + fc2 (reference
    inceptionresnetv1.py:341)."""

    bn_eps: float = 1e-5
    dropout_rate: float = 0.0
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dropout_rate != 0.0:
            x = nn.Dropout(rate=self.dropout_rate,
                           deterministic=not train)(x)
        x = nn.Dense(512, use_bias=False, kernel_init=dense_kernel_init,
                     name="fc1")(x)
        x = BatchNorm(epsilon=self.bn_eps, name="bn")(x, train=train)
        return nn.Dense(self.num_classes, kernel_init=dense_kernel_init,
                        name="fc2")(x)


def InceptionResNetV1(dropout_prob: float = 0.6, bn_eps: float = 1e-5,
                      in_channels: int = 3,
                      in_size: Tuple[int, int] = (299, 299),
                      num_classes: int = 1000) -> ImageClassifier:
    """InceptionResNetV1 (reference inceptionresnetv1.py:391)."""
    nm = lambda_batchnorm2d(eps=bn_eps)
    stage_layers = [5, 11, 7]
    in_channels_list = [256, 896, 1792]
    normal_ocl = [[32, 32, 32, 32, 32, 32], [128, 128, 128, 128],
                  [192, 192, 192, 192]]
    reduction_ocl = [[384, 192, 192, 256], [256, 384, 256, 256, 256, 256, 256]]
    layers = build_incept_resnet_features(
        InceptInitBlock(normalization=nm, name="init_block"),
        stage_layers, in_channels_list, normal_ocl, reduction_ocl, nm)
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=InceptHead(bn_eps=bn_eps, dropout_rate=dropout_prob,
                          num_classes=num_classes, name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def build_incept_resnet_features(init_block, stage_layers, in_channels_list,
                                 normal_ocl, reduction_ocl, nm):
    """Shared stage builder for inceptionresnet v1/v2 (reference
    inceptionresnetv1.py:407-436, inceptionresnetv2.py:155-184)."""
    normal_units = [InceptionAUnit, InceptionBUnit, InceptionCUnit]
    reduction_units = [ReductionAUnit, ReductionBUnit]
    layers = [init_block]
    in_channels = in_channels_list[0]
    for i, layers_per_stage in enumerate(stage_layers):
        units = []
        for j in range(layers_per_stage):
            if (j == 0) and (i != 0):
                unit = reduction_units[i - 1]
                ocl = reduction_ocl[i - 1]
            else:
                unit = normal_units[i]
                ocl = normal_ocl[i]
            kwargs = {}
            if (i == len(stage_layers) - 1) and (j == layers_per_stage - 1):
                kwargs = {"scale": 1.0, "activate": False}
            units.append(unit(in_channels=in_channels,
                              out_channels_list=tuple(ocl),
                              normalization=nm, name=f"unit{j + 1}",
                              **kwargs))
            if (j == 0) and (i != 0):
                in_channels = in_channels_list[i]
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    return layers


@register_model("inceptionresnetv1")
def inceptionresnetv1(**kwargs):
    return InceptionResNetV1(bn_eps=1e-3, **kwargs)
