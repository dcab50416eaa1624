"""ShaResNet for ImageNet-1K, TPU-native (JAX/flax, NHWC).

Behavioral reference: pytorchcv ``models/sharesnet.py`` (ShaConvBlock:18,
ShaResBlock:125, ShaResBottleneck:162, ShaResUnit:222, ShaResNet:286,
get_sharesnet:382) from 'ShaResNet: reducing residual network parameter
number by sharing weights' https://arxiv.org/abs/1702.08782.

The stage's 3x3 residual conv is ONE weight shared by every unit: the
first eligible unit owns it (params live under ``unit1.body.conv2.conv``,
exactly the torch checkpoint's canonical alias) and later units call the
same bound module — linen resolves their applications to the owner's
parameters, so sharing is free under jit (one weight in HBM, many MXU
calls)."""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (BatchNorm, Sequential, avg_pool2d, conv1x1_block,
                  conv3x3, conv3x3_block, lambda_relu)
from ..nn.activ import create_activation_layer
from ..nn.base import IntPair, dense_kernel_init
from ..nn.base import Composed
from .registry import register_model
from .resnet import ResInitBlock
from .shell import ImageClassifier

__all__ = ["ShaResNet", "get_sharesnet"]


class ShaConvBlock(nn.Module):
    """conv(+shared)/BN/act block (reference sharesnet.py:18). ``shared`` is
    a per-stage dict: the first caller stores its bound conv, later callers
    reuse it."""

    out_channels: int = 0
    stride: IntPair = 1
    activation: Any = lambda_relu()
    activate: bool = True

    @nn.compact
    def __call__(self, x, shared: Optional[dict] = None,
                 train: bool = False):
        if shared is not None and "conv" in shared:
            x = shared["conv"](x)
        else:
            conv = conv3x3(out_channels=self.out_channels,
                           stride=self.stride, name="conv")
            if shared is not None:
                shared["conv"] = conv
            x = conv(x)
        x = BatchNorm(name="bn")(x, train=train)
        if self.activate:
            x = create_activation_layer(self.activation, name="activ")(x)
        return x


class ShaResBlock(nn.Module):
    """Basic block; second conv shared (reference sharesnet.py:125)."""

    out_channels: int = 0
    stride: IntPair = 1

    @nn.compact
    def __call__(self, x, shared=None, train: bool = False):
        x = conv3x3_block(out_channels=self.out_channels,
                          stride=self.stride, name="conv1")(x, train=train)
        return ShaConvBlock(out_channels=self.out_channels, activate=False,
                            name="conv2")(x, shared, train=train)


class ShaResBottleneck(nn.Module):
    """Bottleneck; middle 3x3 shared (reference sharesnet.py:162)."""

    out_channels: int = 0
    stride: IntPair = 1
    conv1_stride: bool = False
    bottleneck_factor: int = 4

    @nn.compact
    def __call__(self, x, shared=None, train: bool = False):
        mid_channels = self.out_channels // self.bottleneck_factor
        x = conv1x1_block(out_channels=mid_channels,
                          stride=(self.stride if self.conv1_stride else 1),
                          name="conv1")(x, train=train)
        x = ShaConvBlock(out_channels=mid_channels,
                         stride=(1 if self.conv1_stride else self.stride),
                         name="conv2")(x, shared, train=train)
        return conv1x1_block(out_channels=self.out_channels,
                             activation=None, name="conv3")(x, train=train)


class ShaResUnit(nn.Module):
    """Residual unit (reference sharesnet.py:222)."""

    out_channels: int = 0
    stride: IntPair = 1
    bottleneck: bool = True
    conv1_stride: bool = False

    @nn.compact
    def __call__(self, x, shared=None, train: bool = False):
        resize_identity = (x.shape[-1] != self.out_channels) or \
            (self.stride != 1)
        if resize_identity:
            identity = conv1x1_block(out_channels=self.out_channels,
                                     stride=self.stride, activation=None,
                                     name="identity_conv")(x, train=train)
        else:
            identity = x
        if self.bottleneck:
            x = ShaResBottleneck(out_channels=self.out_channels,
                                 stride=self.stride,
                                 conv1_stride=self.conv1_stride,
                                 name="body")(x, shared, train=train)
        else:
            x = ShaResBlock(out_channels=self.out_channels,
                            stride=self.stride, name="body")(
                                x, shared, train=train)
        return nn.relu(x + identity)


class ShaStage(Composed):
    """A stage whose units share one 3x3 conv. A unit whose shared conv
    would need stride (bottleneck, conv1_stride=False, stride>1) neither
    owns nor uses it (reference sharesnet.py:333-335)."""

    units: Any = ()
    can_share: Any = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        shared: dict = {}
        for unit, can in zip(self.units, self.can_share):
            m = self.adopt(unit)
            x = m(x, shared if can else None, train=train)
        return x


def ShaResNet(channels, init_block_channels: int, bottleneck: bool,
              conv1_stride: bool, in_channels: int = 3,
              in_size: Tuple[int, int] = (224, 224),
              num_classes: int = 1000) -> ImageClassifier:
    """ShaResNet (reference sharesnet.py:286)."""
    layers = [ResInitBlock(out_channels=init_block_channels,
                           name="init_block", parent=None)]
    for i, channels_per_stage in enumerate(channels):
        units, can_share = [], []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(ShaResUnit(
                out_channels=out_channels, stride=stride,
                bottleneck=bottleneck, conv1_stride=conv1_stride,
                name=f"unit{j + 1}", parent=None))
            can_share.append(
                not (bottleneck and not conv1_stride and stride > 1))
        layers.append(ShaStage(units=tuple(units),
                               can_share=tuple(can_share),
                               name=f"stage{i + 1}", parent=None))
    layers.append(avg_pool2d(kernel_size=7, stride=1))
    features = Sequential(layers=tuple(layers), name="features")
    return ImageClassifier(
        features=features,
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_sharesnet(blocks: int, conv1_stride: bool = True, **kwargs):
    """Config expander (reference sharesnet.py:382)."""
    layer_table = {18: [2, 2, 2, 2], 34: [3, 4, 6, 3], 50: [3, 4, 6, 3],
                   101: [3, 4, 23, 3], 152: [3, 8, 36, 3],
                   200: [3, 24, 36, 3]}
    layers = layer_table[blocks]
    init_block_channels = 64
    if blocks < 50:
        channels_per_layers = [64, 128, 256, 512]
        bottleneck = False
    else:
        channels_per_layers = [256, 512, 1024, 2048]
        bottleneck = True
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    return ShaResNet(channels=channels,
                     init_block_channels=init_block_channels,
                     bottleneck=bottleneck, conv1_stride=conv1_stride,
                     **kwargs)


@register_model("sharesnet18")
def sharesnet18(**kwargs):
    return get_sharesnet(blocks=18, **kwargs)


@register_model("sharesnet34")
def sharesnet34(**kwargs):
    return get_sharesnet(blocks=34, **kwargs)


@register_model("sharesnet50")
def sharesnet50(**kwargs):
    return get_sharesnet(blocks=50, **kwargs)


@register_model("sharesnet50b")
def sharesnet50b(**kwargs):
    return get_sharesnet(blocks=50, conv1_stride=False, **kwargs)


@register_model("sharesnet101")
def sharesnet101(**kwargs):
    return get_sharesnet(blocks=101, **kwargs)


@register_model("sharesnet101b")
def sharesnet101b(**kwargs):
    return get_sharesnet(blocks=101, conv1_stride=False, **kwargs)


@register_model("sharesnet152")
def sharesnet152(**kwargs):
    return get_sharesnet(blocks=152, **kwargs)


@register_model("sharesnet152b")
def sharesnet152b(**kwargs):
    return get_sharesnet(blocks=152, conv1_stride=False, **kwargs)
