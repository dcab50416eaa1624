"""InceptionResNetV2, TPU-native. Behavioral reference: pytorchcv
``models/inceptionresnetv2.py`` (InceptBlock5b:15, InceptInitBlock:62,
InceptionResNetV2:131, inceptionresnetv2:258). Reuses the residual units
from inceptionresnetv1 (as the reference does)."""

from __future__ import annotations

from typing import Any, Tuple

from flax import linen as nn

from ..nn import Concurrent, Sequential, conv1x1_block, conv3x3_block, \
    global_avg_pool2d, max_pool2d
from ..nn.norm import lambda_batchnorm2d
from .inceptionresnetv1 import build_incept_resnet_features
from .inceptionv3 import (AvgPoolBranch, Conv1x1Branch, DropoutDense,
                          conv_seq_branch)
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["InceptionResNetV2"]


class InceptBlock5b(nn.Module):
    """Mixed-5b block (reference inceptionresnetv2.py:15)."""

    normalization: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        nm = self.normalization
        return Concurrent(layers=(
            Conv1x1Branch(out_channels=96, normalization=nm, name="branch1",
                          parent=None),
            conv_seq_branch((48, 64), (1, 5), (1, 1), (0, 2),
                            normalization=nm, name="branch2"),
            conv_seq_branch((64, 96, 96), (1, 3, 3), (1, 1, 1), (0, 1, 1),
                            normalization=nm, name="branch3"),
            AvgPoolBranch(out_channels=64, normalization=nm,
                          count_include_pad=False, name="branch4",
                          parent=None),
        ), name="branches")(x, train=train)


class InceptInitBlock(nn.Module):
    """InceptionResNetV2 stem (reference inceptionresnetv2.py:62)."""

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
        x = InceptBlock5b(normalization=nm, name="block")(x, train=train)
        return x


def InceptionResNetV2(dropout_rate: float = 0.0, bn_eps: float = 1e-5,
                      in_channels: int = 3,
                      in_size: Tuple[int, int] = (299, 299),
                      num_classes: int = 1000) -> ImageClassifier:
    """InceptionResNetV2 (reference inceptionresnetv2.py:131)."""
    nm = lambda_batchnorm2d(eps=bn_eps)
    stage_layers = [10, 21, 11]
    in_channels_list = [320, 1088, 2080]
    normal_ocl = [[32, 32, 32, 32, 48, 64], [192, 128, 160, 192],
                  [192, 192, 224, 256]]
    reduction_ocl = [[384, 256, 256, 384], [256, 384, 256, 288, 256, 288, 320]]
    layers = build_incept_resnet_features(
        InceptInitBlock(normalization=nm, name="init_block"),
        stage_layers, in_channels_list, normal_ocl, reduction_ocl, nm)
    layers.append(conv1x1_block(out_channels=1536, normalization=nm,
                                name="final_conv"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=DropoutDense(num_classes=num_classes,
                            dropout_rate=dropout_rate, name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


@register_model("inceptionresnetv2")
def inceptionresnetv2(**kwargs):
    return InceptionResNetV2(bn_eps=1e-3, **kwargs)
