"""FishNet for ImageNet-1K, TPU-native (JAX/flax, NHWC).

Behavioral reference: pytorchcv ``models/fishnet.py`` (channel_squeeze:19,
PreSEAttBlock:61, FishBottleneck:112, FishBlock:159, DownUnit:219,
UpUnit:255, SkipUnit:296, SkipAttUnit:325, FishFinalBlock:380,
FishNet:413, get_fishnet:545) — the tail/body/head fish topology is
expressed through the shared :class:`SesquialteralHourglass` cell; channel
squeeze is a reshape+sum (fuses into the adjacent add)."""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (BatchNorm, Identity, InterpolationBlock, Sequential,
                  SesquialteralHourglass, avg_pool2d, conv1x1, max_pool2d,
                  pre_conv1x1_block, pre_conv3x3_block)
from ..nn.base import IntPair
from .preresnet import PreResActivation
from .registry import register_model
from .senet import SEInitBlock
from .shell import ImageClassifier

__all__ = ["FishNet", "ChannelSqueeze", "channel_squeeze", "get_fishnet"]


def channel_squeeze(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Sum channel groups: (..., C) -> (..., C/groups) (reference
    fishnet.py:19; note the torch layout makes dim -3 the group axis —
    in NHWC the equivalent split is (C/g, g) with sum over the last)."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w, c // groups, groups).sum(axis=-1)


class ChannelSqueeze(nn.Module):
    """Wrapper module over :func:`channel_squeeze` (reference
    fishnet.py:39)."""

    groups: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        return channel_squeeze(x, self.groups)


class PreSEAttBlock(nn.Module):
    """Pre-activated SE attention (reference fishnet.py:61)."""

    out_channels: int = 0
    reduction: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = self.out_channels // self.reduction
        x = BatchNorm(name="bn")(x, train=train)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2), keepdims=True)
        x = conv1x1(out_channels=mid_channels, bias=True, name="conv1")(x)
        x = nn.relu(x)
        x = conv1x1(out_channels=self.out_channels, bias=True,
                    name="conv2")(x)
        return nn.sigmoid(x)


class FishBottleneck(nn.Module):
    """Pre-activated bottleneck (reference fishnet.py:112)."""

    out_channels: int = 0
    stride: IntPair = 1
    dilation: IntPair = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = self.out_channels // 4
        x = pre_conv1x1_block(out_channels=mid_channels, name="conv1")(
            x, train=train)
        x = pre_conv3x3_block(out_channels=mid_channels, stride=self.stride,
                              padding=self.dilation, dilation=self.dilation,
                              name="conv2")(x, train=train)
        x = pre_conv1x1_block(out_channels=self.out_channels, name="conv3")(
            x, train=train)
        return x


class FishBlock(nn.Module):
    """FishNet residual block; ``squeeze`` halves identity channels by
    group-sum (reference fishnet.py:159)."""

    out_channels: int = 0
    stride: IntPair = 1
    dilation: IntPair = 1
    squeeze: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        resize_identity = (x.shape[-1] != self.out_channels) or \
            (self.stride != 1)
        if self.squeeze:
            assert x.shape[-1] // 2 == self.out_channels
            identity = channel_squeeze(x, groups=2)
        elif resize_identity:
            identity = pre_conv1x1_block(
                out_channels=self.out_channels, stride=self.stride,
                name="identity_conv")(x, train=train)
        else:
            identity = x
        x = FishBottleneck(out_channels=self.out_channels,
                           stride=self.stride, dilation=self.dilation,
                           name="body")(x, train=train)
        return x + identity


def _fish_blocks(out_channels_list, dilation=1) -> Sequential:
    """Block stack scoped ``blocks`` — call only inside a compact scope
    (auto-binds to the calling unit)."""
    blocks = []
    for i, out_channels in enumerate(out_channels_list):
        squeeze = (dilation > 1) and (i == 0)
        blocks.append(FishBlock(out_channels=out_channels,
                                dilation=dilation, squeeze=squeeze,
                                name=f"block{i + 1}", parent=None))
    return Sequential(layers=tuple(blocks), name="blocks")


class DownUnit(nn.Module):
    """Blocks + maxpool/2 (reference fishnet.py:219)."""

    out_channels_list: Any = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _fish_blocks(self.out_channels_list)(x, train=train)
        return max_pool2d(kernel_size=2, stride=2)(x)


class UpUnit(nn.Module):
    """Blocks + nearest 2x upsample (reference fishnet.py:255)."""

    out_channels_list: Any = ()
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _fish_blocks(self.out_channels_list, self.dilation)(
            x, train=train)
        return InterpolationBlock(scale_factor=2, mode="nearest",
                                  align_corners=None)(x)


class SkipUnit(nn.Module):
    """Plain block stack (reference fishnet.py:296)."""

    out_channels_list: Any = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        return _fish_blocks(self.out_channels_list)(x, train=train)


class SkipAttUnit(nn.Module):
    """Skip stack gated by pre-activated SE (reference fishnet.py:325)."""

    out_channels_list: Any = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        x = pre_conv1x1_block(out_channels=in_channels // 2, name="conv1")(
            x, train=train)
        x = pre_conv1x1_block(out_channels=2 * in_channels, bias=True,
                              name="conv2")(x, train=train)
        w = PreSEAttBlock(out_channels=self.out_channels_list[-1],
                          name="se")(x, train=train)
        x = _fish_blocks(self.out_channels_list)(x, train=train)
        return x * w + w


class FishFinalBlock(nn.Module):
    """pre-1x1 conv + pre-activation (reference fishnet.py:380)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = x.shape[-1] // 2
        x = pre_conv1x1_block(out_channels=mid_channels, name="conv1")(
            x, train=train)
        return PreResActivation(name="preactiv")(x, train=train)


def FishNet(direct_channels, skip_channels, init_block_channels: int,
            in_channels: int = 3, in_size: Tuple[int, int] = (224, 224),
            num_classes: int = 1000) -> ImageClassifier:
    """FishNet (reference fishnet.py:413) from 'FishNet: A Versatile
    Backbone for Image, Region, and Pixel Level Prediction'."""
    depth = len(direct_channels[0])
    down1_channels, up_channels, down2_channels = direct_channels
    skip1_channels, skip2_channels = skip_channels

    down1_seq, skip1_seq = [], []
    for i in range(depth + 1):
        if i < depth:
            skip1_seq.append(SkipUnit(out_channels_list=skip1_channels[i],
                                      name=f"unit{i + 1}", parent=None))
            down1_seq.append(DownUnit(out_channels_list=down1_channels[i],
                                      name=f"unit{i + 1}", parent=None))
        else:
            skip1_seq.append(SkipAttUnit(
                out_channels_list=skip1_channels[i], name=f"unit{i + 1}",
                parent=None))

    up_seq, skip2_seq = [], []
    for i in range(depth + 1):
        if i < depth:
            skip2_seq.append(SkipUnit(out_channels_list=skip2_channels[i],
                                      name=f"unit{i + 1}", parent=None))
            up_seq.append(UpUnit(out_channels_list=up_channels[i],
                                 dilation=2 ** i, name=f"unit{i + 1}",
                                 parent=None))
        else:
            skip2_seq.append(Identity())

    down2_seq = [DownUnit(out_channels_list=down2_channels[i],
                          name=f"unit{i + 1}", parent=None)
                 for i in range(depth)]

    features = Sequential(layers=(
        SEInitBlock(out_channels=init_block_channels, name="init_block",
                    parent=None),
        SesquialteralHourglass(
            down1_seq=tuple(down1_seq), skip1_seq=tuple(skip1_seq),
            up_seq=tuple(up_seq), skip2_seq=tuple(skip2_seq),
            down2_seq=tuple(down2_seq), name="hg", parent=None),
        FishFinalBlock(name="final_block", parent=None),
        avg_pool2d(kernel_size=7, stride=1),
    ), name="features")
    output = Sequential(layers=(
        conv1x1(out_channels=num_classes, bias=True, name="final_conv",
                parent=None),
    ), name="output", parent=None)

    return ImageClassifier(features=features, output=output,
                           output_before_flatten=True, in_size=in_size,
                           in_channels=in_channels, num_classes=num_classes)


def get_fishnet(blocks: int, **kwargs):
    """Config expander (reference fishnet.py:545)."""
    if blocks == 99:
        direct_layers = [[2, 2, 6], [1, 1, 1], [1, 2, 2]]
        skip_layers = [[1, 1, 1, 2], [4, 1, 1, 0]]
    elif blocks == 150:
        direct_layers = [[2, 4, 8], [2, 2, 2], [2, 2, 4]]
        skip_layers = [[2, 2, 2, 4], [4, 2, 2, 0]]
    else:
        raise ValueError(f"Unsupported FishNet with blocks: {blocks}")
    direct_channels_per_layers = [[128, 256, 512], [512, 384, 256],
                                  [320, 832, 1600]]
    skip_channels_per_layers = [[64, 128, 256, 512], [512, 768, 512, 0]]
    direct_channels = [[[b] * c for b, c in zip(ci, li)]
                       for ci, li in zip(direct_channels_per_layers,
                                         direct_layers)]
    skip_channels = [[[b] * c for b, c in zip(ci, li)]
                     for ci, li in zip(skip_channels_per_layers,
                                       skip_layers)]
    return FishNet(direct_channels=direct_channels,
                   skip_channels=skip_channels, init_block_channels=64,
                   **kwargs)


@register_model("fishnet99")
def fishnet99(**kwargs):
    return get_fishnet(blocks=99, **kwargs)


@register_model("fishnet150")
def fishnet150(**kwargs):
    return get_fishnet(blocks=150, **kwargs)
