"""ResAttNet for ImageNet-1K, TPU-native (JAX/flax, NHWC).

Behavioral reference: pytorchcv ``models/resattnet.py`` (
PreResBottleneck:16, ResBlock:74, InterpolationBlock:118,
DoubleSkipBlock:141, ResBlockSequence:166, DownAttBlock:197,
UpAttBlock:232, MiddleAttBlock:270, AttBlock:299, ResAttInitBlock:376,
ResAttNet:431, get_resattnet:521) from 'Residual Attention Network for
Image Classification' https://arxiv.org/abs/1704.06904. The trunk-and-mask
attention is the shared :class:`Hourglass` with ``return_first_skip``."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (BatchNorm, Hourglass, InterpolationBlock, Sequential,
                  avg_pool2d, conv1x1, conv7x7_block, max_pool2d,
                  pre_conv1x1_block, pre_conv3x3_block)
from ..nn.base import IntPair, dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["ResAttNet", "get_resattnet"]


class PreResBottleneck(nn.Module):
    """Pre-activated bottleneck returning the pre-activation (reference
    resattnet.py:16)."""

    out_channels: int = 0
    stride: IntPair = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = self.out_channels // 4
        x, x_pre_activ = pre_conv1x1_block(
            out_channels=mid_channels, return_preact=True, name="conv1")(
                x, train=train)
        x = pre_conv3x3_block(out_channels=mid_channels, stride=self.stride,
                              name="conv2")(x, train=train)
        x = pre_conv1x1_block(out_channels=self.out_channels, name="conv3")(
            x, train=train)
        return x, x_pre_activ


class ResBlock(nn.Module):
    """Pre-activated residual block (reference resattnet.py:74)."""

    out_channels: int = 0
    stride: IntPair = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        resize_identity = (x.shape[-1] != self.out_channels) or \
            (self.stride != 1)
        identity = x
        x, x_pre_activ = PreResBottleneck(
            out_channels=self.out_channels, stride=self.stride,
            name="body")(x, train=train)
        if resize_identity:
            identity = conv1x1(out_channels=self.out_channels,
                               stride=self.stride, name="identity_conv")(
                                   x_pre_activ)
        return x + identity


class DoubleSkipBlock(nn.Module):
    """x + ResBlock(x) (reference resattnet.py:141)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x + ResBlock(out_channels=self.out_channels, name="skip1")(
            x, train=train)


class ResBlockSequence(nn.Module):
    """Stack of pre-activated residual blocks (reference
    resattnet.py:166)."""

    out_channels: int = 0
    length: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        return Sequential(layers=tuple(
            ResBlock(out_channels=self.out_channels, name=f"block{i + 1}",
                     parent=None) for i in range(self.length)),
            name="blocks")(x, train=train)


class DownAttBlock(nn.Module):
    """maxpool + residual stack (reference resattnet.py:197)."""

    out_channels: int = 0
    length: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = max_pool2d(kernel_size=3, stride=2, padding=1)(x)
        return ResBlockSequence(out_channels=self.out_channels,
                                length=self.length, name="res_blocks")(
                                    x, train=train)


class UpAttBlock(nn.Module):
    """residual stack + bilinear 2x upsample (reference
    resattnet.py:232)."""

    out_channels: int = 0
    length: int = 1
    scale_factor: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ResBlockSequence(out_channels=self.out_channels,
                             length=self.length, name="res_blocks")(
                                 x, train=train)
        return InterpolationBlock(scale_factor=self.scale_factor,
                                  mode="bilinear", align_corners=True)(x)


class MiddleAttBlock(nn.Module):
    """Two pre-1x1 conv blocks + sigmoid mask (reference
    resattnet.py:270)."""

    channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = pre_conv1x1_block(out_channels=self.channels, name="conv1")(
            x, train=train)
        x = pre_conv1x1_block(out_channels=self.channels, name="conv2")(
            x, train=train)
        return nn.sigmoid(x)


class AttBlock(nn.Module):
    """Trunk-and-mask attention block (reference resattnet.py:299):
    hourglass soft mask, (1 + mask) * trunk."""

    out_channels: int = 0
    hourglass_depth: int = 1
    att_scales: Any = (1, 2, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        scale_p, scale_t, scale_r = self.att_scales
        x = ResBlockSequence(out_channels=self.out_channels, length=scale_p,
                             name="init_blocks")(x, train=train)
        downs, ups, skips = [], [], []
        for i in range(self.hourglass_depth):
            downs.append(DownAttBlock(out_channels=self.out_channels,
                                      length=scale_r, name=f"down{i + 1}",
                                      parent=None))
            ups.append(UpAttBlock(out_channels=self.out_channels,
                                  length=scale_r, scale_factor=2,
                                  name=f"up{i + 1}", parent=None))
            if i == 0:
                skips.append(ResBlockSequence(
                    out_channels=self.out_channels, length=scale_t,
                    name="skip1", parent=None))
            else:
                skips.append(DoubleSkipBlock(
                    out_channels=self.out_channels, name=f"skip{i + 1}",
                    parent=None))
        x, y = Hourglass(down_seq=tuple(downs), up_seq=tuple(ups),
                         skip_seq=tuple(skips), return_first_skip=True,
                         name="hg")(x, train=train)
        x = MiddleAttBlock(channels=self.out_channels, name="middle_block")(
            x, train=train)
        x = (1 + x) * y
        return ResBlock(out_channels=self.out_channels, name="final_block")(
            x, train=train)


class ResAttInitBlock(nn.Module):
    """7x7/2 conv block + maxpool/2 (reference resattnet.py:376)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv7x7_block(out_channels=self.out_channels, stride=2,
                          name="conv")(x, train=train)
        return max_pool2d(kernel_size=3, stride=2, padding=1)(x)


class PreActivation(nn.Module):
    """Final BN+ReLU (reference resattnet.py:408)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(name="bn")(x, train=train)
        return nn.relu(x)


def ResAttNet(channels, init_block_channels: int, attentions, att_scales,
              in_channels: int = 3, in_size: Tuple[int, int] = (224, 224),
              num_classes: int = 1000) -> ImageClassifier:
    """ResAttNet (reference resattnet.py:431)."""
    layers = [ResAttInitBlock(out_channels=init_block_channels,
                              name="init_block", parent=None)]
    for i, channels_per_stage in enumerate(channels):
        hourglass_depth = len(channels) - 1 - i
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 1 if (i == 0) or (j != 0) else 2
            if attentions[i][j]:
                units.append(AttBlock(
                    out_channels=out_channels,
                    hourglass_depth=hourglass_depth,
                    att_scales=tuple(att_scales), name=f"unit{j + 1}",
                    parent=None))
            else:
                units.append(ResBlock(out_channels=out_channels,
                                      stride=stride, name=f"unit{j + 1}",
                                      parent=None))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}",
                                 parent=None))
    layers.append(PreActivation(name="post_activ", parent=None))
    layers.append(avg_pool2d(kernel_size=7, stride=1))
    features = Sequential(layers=tuple(layers), name="features")
    return ImageClassifier(
        features=features,
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_resattnet(blocks: int, **kwargs):
    """Config expander (reference resattnet.py:521)."""
    table = {56: ([1, 1, 1], [1, 2, 1]), 92: ([1, 2, 3], [1, 2, 1]),
             128: ([2, 3, 4], [1, 2, 1]), 164: ([3, 4, 5], [1, 2, 1]),
             200: ([4, 5, 6], [1, 2, 1]), 236: ([5, 6, 7], [1, 2, 1]),
             452: ([5, 6, 7], [2, 4, 3])}
    if blocks not in table:
        raise ValueError(f"Unsupported ResAttNet with blocks: {blocks}")
    att_layers, att_scales = table[blocks]
    init_block_channels = 64
    channels_per_layers = [256, 512, 1024, 2048]
    layers = att_layers + [2]
    channels = [[ci] * (li + 1)
                for ci, li in zip(channels_per_layers, layers)]
    attentions = [[0] + [1] * li for li in att_layers] + [[0] * 3]
    return ResAttNet(channels=channels,
                     init_block_channels=init_block_channels,
                     attentions=attentions, att_scales=att_scales, **kwargs)


@register_model("resattnet56")
def resattnet56(**kwargs):
    return get_resattnet(blocks=56, **kwargs)


@register_model("resattnet92")
def resattnet92(**kwargs):
    return get_resattnet(blocks=92, **kwargs)


@register_model("resattnet128")
def resattnet128(**kwargs):
    return get_resattnet(blocks=128, **kwargs)


@register_model("resattnet164")
def resattnet164(**kwargs):
    return get_resattnet(blocks=164, **kwargs)


@register_model("resattnet200")
def resattnet200(**kwargs):
    return get_resattnet(blocks=200, **kwargs)


@register_model("resattnet236")
def resattnet236(**kwargs):
    return get_resattnet(blocks=236, **kwargs)


@register_model("resattnet452")
def resattnet452(**kwargs):
    return get_resattnet(blocks=452, **kwargs)
