"""MobileNetV3, TPU-native. Behavioral reference: pytorchcv
``models/mobilenetv3.py`` (MobileNetV3Unit:17, MobileNetV3FinalBlock:95,
MobileNetV3Classifier:131, MobileNetV3:174, get_mobilenetv3:330).
SE gates use hard-sigmoid; activations are relu/hswish per-unit flags.
"""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import (SEBlock, Sequential, conv1x1, conv1x1_block, conv3x3_block,
                  dwconv3x3_block, dwconv5x5_block, global_avg_pool2d,
                  hswish, lambda_hsigmoid, lambda_hswish, lambda_relu,
                  round_channels)
from ..nn.base import IntPair
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["MobileNetV3", "MobileNetV3Unit", "get_mobilenetv3"]


class MobileNetV3Unit(nn.Module):
    """exp 1x1 -> dw 3/5 -> [SE] -> project 1x1
    (reference mobilenetv3.py:17)."""

    out_channels: int = 0
    exp_channels: int = 0
    stride: IntPair = 1
    use_kernel3: bool = True
    activation: object = lambda_relu()
    use_se: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        residual = (in_channels == self.out_channels) and (self.stride == 1)
        use_exp_conv = self.exp_channels != self.out_channels
        mid_channels = self.exp_channels
        identity = x
        if use_exp_conv:
            x = conv1x1_block(out_channels=mid_channels,
                              activation=self.activation,
                              name="exp_conv")(x, train=train)
        dw = dwconv3x3_block if self.use_kernel3 else dwconv5x5_block
        x = dw(out_channels=mid_channels, stride=self.stride,
               activation=self.activation, name="conv1")(x, train=train)
        if self.use_se:
            x = SEBlock(channels=mid_channels, reduction=4, round_mid=True,
                        out_activation=lambda_hsigmoid(), name="se")(x)
        x = conv1x1_block(out_channels=self.out_channels, activation=None,
                          name="conv2")(x, train=train)
        if residual:
            x = x + identity
        return x


class MobileNetV3FinalBlock(nn.Module):
    """1x1 conv block (hswish) + optional SE
    (reference mobilenetv3.py:95)."""

    out_channels: int = 0
    use_se: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv1x1_block(out_channels=self.out_channels,
                          activation=lambda_hswish(), name="conv")(
                              x, train=train)
        if self.use_se:
            x = SEBlock(channels=self.out_channels, reduction=4,
                        round_mid=True, out_activation=lambda_hsigmoid(),
                        name="se")(x)
        return x


class MobileNetV3Classifier(nn.Module):
    """1x1 -> hswish -> [dropout] -> 1x1(bias) on the pooled feature
    (reference mobilenetv3.py:131)."""

    out_channels: int = 0
    mid_channels: int = 0
    dropout_rate: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv1x1(out_channels=self.mid_channels, name="conv1")(x)
        x = hswish(x)
        if self.dropout_rate != 0.0 and train:
            x = nn.Dropout(rate=self.dropout_rate, deterministic=False,
                           name="dropout")(x)
        x = conv1x1(out_channels=self.out_channels, bias=True,
                    name="conv2")(x)
        return x


def MobileNetV3(channels, exp_channels, init_block_channels: int,
                final_block_channels: int, classifier_mid_channels: int,
                kernels3, use_relu, use_se, first_stride: bool,
                final_use_se: bool, in_channels: int = 3,
                in_size: Tuple[int, int] = (224, 224),
                num_classes: int = 1000) -> ImageClassifier:
    """MobileNetV3 (reference mobilenetv3.py:174)."""
    layers = [conv3x3_block(out_channels=init_block_channels, stride=2,
                            activation=lambda_hswish(), name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and ((i != 0) or first_stride) else 1
            units.append(MobileNetV3Unit(
                out_channels=out_channels, exp_channels=exp_channels[i][j],
                stride=stride, use_kernel3=kernels3[i][j] == 1,
                activation=(lambda_relu() if use_relu[i][j] == 1
                            else lambda_hswish()),
                use_se=use_se[i][j] == 1, name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(MobileNetV3FinalBlock(out_channels=final_block_channels,
                                        use_se=final_use_se,
                                        name="final_block"))
    layers.append(global_avg_pool2d(keepdims=True))
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=MobileNetV3Classifier(out_channels=num_classes,
                                     mid_channels=classifier_mid_channels,
                                     dropout_rate=0.2, name="output"),
        output_before_flatten=True,
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_mobilenetv3(version: str, width_scale: float, **kwargs):
    """Config expander (reference mobilenetv3.py:330)."""
    if version == "small":
        init_block_channels = 16
        channels = [[16], [24, 24], [40, 40, 40, 48, 48], [96, 96, 96]]
        exp_channels = [[16], [72, 88], [96, 240, 240, 120, 144],
                        [288, 576, 576]]
        kernels3 = [[1], [1, 1], [0, 0, 0, 0, 0], [0, 0, 0]]
        use_relu = [[1], [1, 1], [0, 0, 0, 0, 0], [0, 0, 0]]
        use_se = [[1], [0, 0], [1, 1, 1, 1, 1], [1, 1, 1]]
        first_stride = True
        final_block_channels = 576
    elif version == "large":
        init_block_channels = 16
        channels = [[16], [24, 24], [40, 40, 40],
                    [80, 80, 80, 80, 112, 112], [160, 160, 160]]
        exp_channels = [[16], [64, 72], [72, 120, 120],
                        [240, 200, 184, 184, 480, 672], [672, 960, 960]]
        kernels3 = [[1], [1, 1], [0, 0, 0], [1, 1, 1, 1, 1, 1], [0, 0, 0]]
        use_relu = [[1], [1, 1], [1, 1, 1], [0, 0, 0, 0, 0, 0], [0, 0, 0]]
        use_se = [[0], [0, 0], [1, 1, 1], [0, 0, 0, 0, 1, 1], [1, 1, 1]]
        first_stride = False
        final_block_channels = 960
    else:
        raise ValueError(f"Unsupported MobileNetV3 version {version}")
    final_use_se = False
    classifier_mid_channels = 1280

    if width_scale != 1.0:
        channels = [[round_channels(cij * width_scale) for cij in ci]
                    for ci in channels]
        exp_channels = [[round_channels(cij * width_scale) for cij in ci]
                        for ci in exp_channels]
        init_block_channels = round_channels(init_block_channels *
                                             width_scale)
        if width_scale > 1.0:
            final_block_channels = round_channels(final_block_channels *
                                                  width_scale)

    return MobileNetV3(
        channels=channels, exp_channels=exp_channels,
        init_block_channels=init_block_channels,
        final_block_channels=final_block_channels,
        classifier_mid_channels=classifier_mid_channels,
        kernels3=kernels3, use_relu=use_relu, use_se=use_se,
        first_stride=first_stride, final_use_se=final_use_se, **kwargs)


def _variant(name, version, width_scale):
    @register_model(name)
    def ctor(**kwargs):
        return get_mobilenetv3(version=version, width_scale=width_scale,
                               **kwargs)
    ctor.__name__ = name
    return ctor


mobilenetv3_small_w7d20 = _variant("mobilenetv3_small_w7d20", "small", 0.35)
mobilenetv3_small_wd2 = _variant("mobilenetv3_small_wd2", "small", 0.5)
mobilenetv3_small_w3d4 = _variant("mobilenetv3_small_w3d4", "small", 0.75)
mobilenetv3_small_w1 = _variant("mobilenetv3_small_w1", "small", 1.0)
mobilenetv3_small_w5d4 = _variant("mobilenetv3_small_w5d4", "small", 1.25)
mobilenetv3_large_w7d20 = _variant("mobilenetv3_large_w7d20", "large", 0.35)
mobilenetv3_large_wd2 = _variant("mobilenetv3_large_wd2", "large", 0.5)
mobilenetv3_large_w3d4 = _variant("mobilenetv3_large_w3d4", "large", 0.75)
mobilenetv3_large_w1 = _variant("mobilenetv3_large_w1", "large", 1.0)
mobilenetv3_large_w5d4 = _variant("mobilenetv3_large_w5d4", "large", 1.25)
