"""ResNet for ImageNet-1K, TPU-native (JAX/flax, NHWC).

Behavioral reference: pytorchcv ``models/resnet.py`` (ResBlock:19,
ResBottleneck:69, ResUnit:143, ResInitBlock:232, ResNet:266,
get_resnet:340) — re-designed functionally: blocks are linen modules whose
conv+BN+act cells compile to single MXU fusions; the identity branch is
decided from the traced input shape instead of bookkept ``in_channels``.

Exported blocks (ResUnit etc.) are reused across ~20 downstream families,
mirroring the reference's block-vocabulary structure.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (ConvBlock, Sequential, conv1x1_block, conv3x3_block,
                  conv7x7_block, global_avg_pool2d, lambda_batchnorm2d,
                  lambda_relu, max_pool2d)
from ..nn.activ import create_activation_layer
from ..nn.base import IntPair, dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["ResNet", "ResBlock", "ResBottleneck", "ResUnit", "ResInitBlock",
           "get_resnet"]


class ResBlock(nn.Module):
    """Simple ResNet block: two 3x3 conv blocks (reference resnet.py:19)."""

    out_channels: int = 0
    stride: IntPair = 1
    bias: bool = False
    normalization: Any = lambda_batchnorm2d()
    activation: Any = lambda_relu()
    final_activation: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.out_channels, stride=self.stride,
                          bias=self.bias, normalization=self.normalization,
                          activation=self.activation, name="conv1")(
                              x, train=train)
        x = conv3x3_block(out_channels=self.out_channels, bias=self.bias,
                          normalization=self.normalization,
                          activation=self.final_activation, name="conv2")(
                              x, train=train)
        return x


class ResBottleneck(nn.Module):
    """ResNet bottleneck: 1x1 down, 3x3, 1x1 up (reference resnet.py:69)."""

    out_channels: int = 0
    stride: IntPair = 1
    padding: IntPair = 1
    dilation: IntPair = 1
    bias: bool = False
    normalization: Any = lambda_batchnorm2d()
    conv1_stride: bool = False
    bottleneck_factor: int = 4
    activation: Any = lambda_relu()
    final_activation: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = self.out_channels // self.bottleneck_factor
        x = conv1x1_block(out_channels=mid_channels,
                          stride=(self.stride if self.conv1_stride else 1),
                          bias=self.bias, normalization=self.normalization,
                          activation=self.activation, name="conv1")(
                              x, train=train)
        x = conv3x3_block(out_channels=mid_channels,
                          stride=(1 if self.conv1_stride else self.stride),
                          padding=self.padding, dilation=self.dilation,
                          bias=self.bias, normalization=self.normalization,
                          activation=self.activation, name="conv2")(
                              x, train=train)
        x = conv1x1_block(out_channels=self.out_channels, bias=self.bias,
                          normalization=self.normalization,
                          activation=self.final_activation, name="conv3")(
                              x, train=train)
        return x


class ResUnit(nn.Module):
    """ResNet unit: body + identity + post-add activation
    (reference resnet.py:143). ``resize_identity`` is derived from the traced
    input shape."""

    out_channels: int = 0
    stride: IntPair = 1
    padding: IntPair = 1
    dilation: IntPair = 1
    bias: bool = False
    normalization: Any = lambda_batchnorm2d()
    bottleneck: bool = True
    conv1_stride: bool = False
    activation: Any = lambda_relu()
    final_body_activation: Any = None
    final_activation: Any = lambda_relu()

    @nn.compact
    def __call__(self, x, train: bool = False):
        resize_identity = (x.shape[-1] != self.out_channels) or \
            (self.stride != 1)
        if self.bottleneck:
            body = ResBottleneck(
                out_channels=self.out_channels, stride=self.stride,
                padding=self.padding, dilation=self.dilation, bias=self.bias,
                normalization=self.normalization,
                conv1_stride=self.conv1_stride, activation=self.activation,
                final_activation=self.final_body_activation, name="body")
        else:
            body = ResBlock(
                out_channels=self.out_channels, stride=self.stride,
                bias=self.bias, normalization=self.normalization,
                activation=self.activation,
                final_activation=self.final_body_activation, name="body")
        if resize_identity:
            identity = conv1x1_block(
                out_channels=self.out_channels, stride=self.stride,
                bias=self.bias, normalization=self.normalization,
                activation=None, name="identity_conv")(x, train=train)
        else:
            identity = x
        x = body(x, train=train)
        x = x + identity
        act = create_activation_layer(self.final_activation, name="activ")
        if act is not None:
            x = act(x)
        return x


class ResInitBlock(nn.Module):
    """ResNet stem: 7x7/2 conv block + 3x3/2 maxpool
    (reference resnet.py:232)."""

    out_channels: int = 0
    normalization: Any = lambda_batchnorm2d()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv7x7_block(out_channels=self.out_channels, stride=2,
                          normalization=self.normalization, name="conv")(
                              x, train=train)
        return max_pool2d(kernel_size=3, stride=2, padding=1)(x)


def resnet_features(channels, init_block_channels: int, bottleneck: bool,
                    conv1_stride: bool, final_pool: bool = True) -> Sequential:
    """Build the ResNet feature trunk as an unbound Sequential (sliceable by
    composed heads, mirroring the reference's ``.features`` attribute)."""
    stages = []
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(ResUnit(
                out_channels=out_channels, stride=stride,
                bottleneck=bottleneck, conv1_stride=conv1_stride,
                name=f"unit{j + 1}"))
        stages.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers = [ResInitBlock(out_channels=init_block_channels,
                           name="init_block"), *stages]
    if final_pool:
        layers.append(global_avg_pool2d(keepdims=False))
    return Sequential(layers=tuple(layers), name="features")


def ResNet(channels, init_block_channels: int, bottleneck: bool,
           conv1_stride: bool, in_channels: int = 3,
           in_size: Tuple[int, int] = (224, 224),
           num_classes: int = 1000) -> ImageClassifier:
    """ResNet (reference resnet.py:266). The final pool is a global average
    (identical to the reference's AvgPool2d(7) at the canonical 224 input,
    and shape-robust otherwise)."""
    return ImageClassifier(
        features=resnet_features(channels, init_block_channels, bottleneck,
                                 conv1_stride),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_resnet(blocks: int,
               bottleneck: Optional[bool] = None,
               conv1_stride: bool = True,
               width_scale: float = 1.0,
               **kwargs) -> ResNet:
    """Config expander for ResNet variants (reference resnet.py:340)."""
    if bottleneck is None:
        bottleneck = (blocks >= 50)

    layer_table = {
        (10, False): [1, 1, 1, 1],
        (12, False): [2, 1, 1, 1],
        (14, False): [2, 2, 1, 1],
        (14, True): [1, 1, 1, 1],
        (16, False): [2, 2, 2, 1],
        (18, False): [2, 2, 2, 2],
        (26, False): [3, 3, 3, 3],
        (26, True): [2, 2, 2, 2],
        (34, False): [3, 4, 6, 3],
        (38, True): [3, 3, 3, 3],
        (50, True): [3, 4, 6, 3],
        (101, True): [3, 4, 23, 3],
        (152, True): [3, 8, 36, 3],
        (200, True): [3, 24, 36, 3],
    }
    key = (blocks, bool(bottleneck))
    if key not in layer_table:
        raise ValueError(f"Unsupported ResNet with blocks={blocks}, "
                         f"bottleneck={bottleneck}")
    layers = layer_table[key]
    if bottleneck:
        assert sum(layers) * 3 + 2 == blocks
    else:
        assert sum(layers) * 2 + 2 == blocks

    init_block_channels = 64
    channels_per_layers = [64, 128, 256, 512]
    if bottleneck:
        channels_per_layers = [ci * 4 for ci in channels_per_layers]
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]

    if width_scale != 1.0:
        channels = [[int(cij * width_scale)
                     if (i != len(channels) - 1) or (j != len(ci) - 1)
                     else cij
                     for j, cij in enumerate(ci)]
                    for i, ci in enumerate(channels)]
        init_block_channels = int(init_block_channels * width_scale)

    return ResNet(
        channels=tuple(tuple(c) for c in channels),
        init_block_channels=init_block_channels,
        bottleneck=bottleneck,
        conv1_stride=conv1_stride,
        **kwargs)


@register_model("resnet10")
def resnet10(**kwargs):
    return get_resnet(blocks=10, **kwargs)


@register_model("resnet12")
def resnet12(**kwargs):
    return get_resnet(blocks=12, **kwargs)


@register_model("resnet14")
def resnet14(**kwargs):
    return get_resnet(blocks=14, **kwargs)


@register_model("resnetbc14b")
def resnetbc14b(**kwargs):
    return get_resnet(blocks=14, bottleneck=True, conv1_stride=False, **kwargs)


@register_model("resnet16")
def resnet16(**kwargs):
    return get_resnet(blocks=16, **kwargs)


@register_model("resnet18_wd4")
def resnet18_wd4(**kwargs):
    return get_resnet(blocks=18, width_scale=0.25, **kwargs)


@register_model("resnet18_wd2")
def resnet18_wd2(**kwargs):
    return get_resnet(blocks=18, width_scale=0.5, **kwargs)


@register_model("resnet18_w3d4")
def resnet18_w3d4(**kwargs):
    return get_resnet(blocks=18, width_scale=0.75, **kwargs)


@register_model("resnet18")
def resnet18(**kwargs):
    return get_resnet(blocks=18, **kwargs)


@register_model("resnet26")
def resnet26(**kwargs):
    return get_resnet(blocks=26, bottleneck=False, **kwargs)


@register_model("resnetbc26b")
def resnetbc26b(**kwargs):
    return get_resnet(blocks=26, bottleneck=True, conv1_stride=False, **kwargs)


@register_model("resnet34")
def resnet34(**kwargs):
    return get_resnet(blocks=34, **kwargs)


@register_model("resnetbc38b")
def resnetbc38b(**kwargs):
    return get_resnet(blocks=38, bottleneck=True, conv1_stride=False, **kwargs)


@register_model("resnet50")
def resnet50(**kwargs):
    return get_resnet(blocks=50, **kwargs)


@register_model("resnet50b")
def resnet50b(**kwargs):
    return get_resnet(blocks=50, conv1_stride=False, **kwargs)


@register_model("resnet101")
def resnet101(**kwargs):
    return get_resnet(blocks=101, **kwargs)


@register_model("resnet101b")
def resnet101b(**kwargs):
    return get_resnet(blocks=101, conv1_stride=False, **kwargs)


@register_model("resnet152")
def resnet152(**kwargs):
    return get_resnet(blocks=152, **kwargs)


@register_model("resnet152b")
def resnet152b(**kwargs):
    return get_resnet(blocks=152, conv1_stride=False, **kwargs)


@register_model("resnet200")
def resnet200(**kwargs):
    return get_resnet(blocks=200, **kwargs)


@register_model("resnet200b")
def resnet200b(**kwargs):
    return get_resnet(blocks=200, conv1_stride=False, **kwargs)
