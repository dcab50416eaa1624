"""DiCENet for ImageNet-1K, TPU-native (JAX/flax, NHWC).

Behavioral reference: pytorchcv ``models/dicenet.py`` (SpatialDiceBranch:20,
DiceBaseBlock:93, DiceAttBlock:151, DiceBlock:201, StridedDiceLeftBranch:250,
StridedDiceRightBranch:285, StridedDiceBlock:327, ShuffledDiceRightBranch:368,
ShuffledDiceBlock:406, DiceInitBlock:448, DiceClassifier:482,
DiceNet:529, get_dicenet:628) from 'DiCENet: Dimension-wise Convolutions
for Efficient Networks' https://arxiv.org/abs/1906.03516.

The dimension-wise branches convolve the (C, W) and (H, C) planes by
swapping the target axis into the channel slot — pure transposes that XLA
turns into layout assignments around a depthwise conv."""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (Concurrent, NormActivation, Sequential, avg_pool2d,
                  channel_shuffle, conv1x1, conv1x1_block, conv3x3,
                  conv3x3_block, depthwise_conv3x3, interpolate,
                  lambda_prelu, max_pool2d)
from ..nn.ops import adaptive_avg_pool2d
from .registry import register_model

__all__ = ["DiceNet", "get_dicenet"]


class SpatialDiceBranch(nn.Module):
    """Depthwise conv over one spatial dimension treated as channels
    (reference dicenet.py:20). ``is_height`` picks the H plane."""

    sp_size: int = 0
    is_height: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        b, h, w, c = x.shape
        real = h if self.is_height else w
        if real != self.sp_size:
            size = (self.sp_size, w) if self.is_height else \
                (h, self.sp_size)
            if real < self.sp_size:
                x = interpolate(x, size, mode="bilinear",
                                align_corners=True)
            else:
                x = adaptive_avg_pool2d(size)(x)
        # swap the chosen axis into the channel slot: spatial plane is
        # (C, W) for the H branch, (H, C) for the W branch
        perm = (0, 3, 2, 1) if self.is_height else (0, 1, 3, 2)
        x = x.transpose(*perm)
        x = depthwise_conv3x3(channels=self.sp_size, name="conv")(x)
        x = x.transpose(*perm)
        changed = x.shape[1] if self.is_height else x.shape[2]
        if real != changed:
            size = (real, x.shape[2]) if self.is_height else \
                (x.shape[1], real)
            if changed < real:
                x = interpolate(x, size, mode="bilinear",
                                align_corners=True)
            else:
                x = adaptive_avg_pool2d(size)(x)
        return x


class DiceBaseBlock(nn.Module):
    """Channel/height/width branches, fused (reference dicenet.py:93)."""

    channels: int = 0
    in_size: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = 3 * self.channels
        x = Concurrent(layers=(
            depthwise_conv3x3(channels=self.channels, name="ch_conv",
                              parent=None),
            SpatialDiceBranch(sp_size=self.in_size[0], is_height=True,
                              name="h_conv", parent=None),
            SpatialDiceBranch(sp_size=self.in_size[1], is_height=False,
                              name="w_conv", parent=None),
        ), name="convs")(x, train=train)
        x = NormActivation(activation=lambda_prelu(mid_channels),
                           name="norm_activ")(x, train=train)
        x = channel_shuffle(x, 3)
        return conv1x1_block(out_channels=self.channels,
                             groups=self.channels,
                             activation=lambda_prelu(self.channels),
                             name="squeeze_conv")(x, train=train)


class DiceAttBlock(nn.Module):
    """SE-style gate, bias-free convs (reference dicenet.py:151)."""

    out_channels: int = 0
    reduction: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        mid_channels = x.shape[-1] // self.reduction
        w = jnp.mean(x, axis=(1, 2), keepdims=True)
        w = conv1x1(out_channels=mid_channels, bias=False, name="conv1")(w)
        w = nn.relu(w)
        w = conv1x1(out_channels=self.out_channels, bias=False,
                    name="conv2")(w)
        return nn.sigmoid(w)


class DiceBlock(nn.Module):
    """Volume-wise separable conv block (reference dicenet.py:201)."""

    out_channels: int = 0
    in_size: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        proj_groups = math.gcd(in_channels, self.out_channels)
        x = DiceBaseBlock(channels=in_channels, in_size=self.in_size,
                          name="base_block")(x, train=train)
        w = DiceAttBlock(out_channels=self.out_channels, name="att")(
            x, train=train)
        x = conv3x3_block(out_channels=self.out_channels,
                          groups=proj_groups,
                          activation=lambda_prelu(self.out_channels),
                          name="proj_conv")(x, train=train)
        return x * w


class StridedDiceLeftBranch(nn.Module):
    """Strided depthwise + pointwise (reference dicenet.py:250)."""

    channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.channels, stride=2,
                          groups=self.channels,
                          activation=lambda_prelu(self.channels),
                          name="conv1")(x, train=train)
        return conv1x1_block(out_channels=self.channels,
                             activation=lambda_prelu(self.channels),
                             name="conv2")(x, train=train)


class StridedDiceRightBranch(nn.Module):
    """avg-pool + dice + pointwise (reference dicenet.py:285)."""

    channels: int = 0
    in_size: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = avg_pool2d(kernel_size=3, stride=2, padding=1)(x)
        x = DiceBlock(out_channels=self.channels,
                      in_size=(self.in_size[0] // 2, self.in_size[1] // 2),
                      name="dice")(x, train=train)
        return conv1x1_block(out_channels=self.channels,
                             activation=lambda_prelu(self.channels),
                             name="conv")(x, train=train)


class StridedDiceBlock(nn.Module):
    """Two-branch strided block (reference dicenet.py:327)."""

    out_channels: int = 0
    in_size: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        assert self.out_channels == 2 * in_channels
        x = Concurrent(layers=(
            StridedDiceLeftBranch(channels=in_channels, name="left_branch",
                                  parent=None),
            StridedDiceRightBranch(channels=in_channels,
                                   in_size=self.in_size,
                                   name="right_branch", parent=None),
        ), name="branches")(x, train=train)
        return channel_shuffle(x, 2)


class ShuffledDiceRightBranch(nn.Module):
    """pointwise + dice (reference dicenet.py:368)."""

    out_channels: int = 0
    in_size: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv1x1_block(out_channels=self.out_channels,
                          activation=lambda_prelu(self.out_channels),
                          name="conv")(x, train=train)
        return DiceBlock(out_channels=self.out_channels,
                         in_size=self.in_size, name="dice")(x, train=train)


class ShuffledDiceBlock(nn.Module):
    """Half-split shuffle block (reference dicenet.py:406)."""

    out_channels: int = 0
    in_size: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        left_part = in_channels - in_channels // 2
        right_out = self.out_channels - left_part
        x1, x2 = x[..., :left_part], x[..., left_part:]
        x2 = ShuffledDiceRightBranch(out_channels=right_out,
                                     in_size=self.in_size,
                                     name="right_branch")(x2, train=train)
        x = jnp.concatenate([x1, x2], axis=-1)
        return channel_shuffle(x, 2)


class DiceInitBlock(nn.Module):
    """3x3/2 conv block + maxpool (reference dicenet.py:448)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.out_channels, stride=2,
                          activation=lambda_prelu(self.out_channels),
                          name="conv")(x, train=train)
        return max_pool2d(kernel_size=3, stride=2, padding=1)(x)


class DiceClassifier(nn.Module):
    """Grouped 1x1 + dropout + 1x1 head (reference dicenet.py:482)."""

    mid_channels: int = 1024
    num_classes: int = 1000
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv1x1(out_channels=self.mid_channels, groups=4,
                    name="conv1")(x)
        x = nn.Dropout(rate=self.dropout_rate,
                       deterministic=not train)(x)
        return conv1x1(out_channels=self.num_classes, bias=True,
                       name="conv2")(x)


class DiceNet(nn.Module):
    """DiCENet (reference dicenet.py:529)."""

    channels: Any = ()
    init_block_channels: int = 24
    classifier_mid_channels: int = 1024
    dropout_rate: float = 0.1
    in_channels: int = 3
    in_size: Tuple[int, int] = (224, 224)
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert (self.in_size[0] % 32 == 0) and (self.in_size[1] % 32 == 0)
        layers = [DiceInitBlock(out_channels=self.init_block_channels,
                                name="init_block", parent=None)]
        in_size = (self.in_size[0] // 4, self.in_size[1] // 4)
        for i, channels_per_stage in enumerate(self.channels):
            units = []
            for j, out_channels in enumerate(channels_per_stage):
                unit_class = StridedDiceBlock if j == 0 else \
                    ShuffledDiceBlock
                units.append(unit_class(out_channels=out_channels,
                                        in_size=in_size,
                                        name=f"unit{j + 1}", parent=None))
                if j == 0:
                    in_size = (in_size[0] // 2, in_size[1] // 2)
            layers.append(Sequential(layers=tuple(units),
                                     name=f"stage{i + 1}", parent=None))
        layers.append(lambda v: jnp.mean(v, axis=(1, 2), keepdims=True))
        x = Sequential(layers=tuple(layers), name="features")(x, train=train)
        x = DiceClassifier(mid_channels=self.classifier_mid_channels,
                           num_classes=self.num_classes,
                           dropout_rate=self.dropout_rate, name="output")(
                               x, train=train)
        return x.reshape(x.shape[0], -1)


def get_dicenet(width_scale: float, **kwargs) -> DiceNet:
    """Config expander (reference dicenet.py:628)."""
    channels_per_layers_dict = {
        0.2: [32, 64, 128], 0.5: [48, 96, 192], 0.75: [86, 172, 344],
        1.0: [116, 232, 464], 1.25: [144, 288, 576], 1.5: [176, 352, 704],
        1.75: [210, 420, 840], 2.0: [244, 488, 976],
        2.4: [278, 556, 1112]}
    if width_scale not in channels_per_layers_dict:
        raise ValueError(f"Unsupported DiceNet width scale: {width_scale}")
    channels_per_layers = channels_per_layers_dict[width_scale]
    layers = [3, 7, 3]
    init_block_channels = 24 if width_scale > 0.2 else 16
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    for i in range(len(channels)):
        pred = channels[i - 1][-1] if i != 0 else init_block_channels
        channels[i] = [pred * 2] + channels[i]
    classifier_mid_channels = 1280 if width_scale > 2.0 else 1024
    dropout_rate = 0.2 if width_scale > 1.0 else 0.1
    return DiceNet(channels=tuple(tuple(c) for c in channels),
                   init_block_channels=init_block_channels,
                   classifier_mid_channels=classifier_mid_channels,
                   dropout_rate=dropout_rate, **kwargs)


@register_model("dicenet_wd5")
def dicenet_wd5(**kwargs):
    return get_dicenet(width_scale=0.2, **kwargs)


@register_model("dicenet_wd2")
def dicenet_wd2(**kwargs):
    return get_dicenet(width_scale=0.5, **kwargs)


@register_model("dicenet_w3d4")
def dicenet_w3d4(**kwargs):
    return get_dicenet(width_scale=0.75, **kwargs)


@register_model("dicenet_w1")
def dicenet_w1(**kwargs):
    return get_dicenet(width_scale=1.0, **kwargs)


@register_model("dicenet_w5d4")
def dicenet_w5d4(**kwargs):
    return get_dicenet(width_scale=1.25, **kwargs)


@register_model("dicenet_w3d2")
def dicenet_w3d2(**kwargs):
    return get_dicenet(width_scale=1.5, **kwargs)


@register_model("dicenet_w7d8")
def dicenet_w7d8(**kwargs):
    return get_dicenet(width_scale=1.75, **kwargs)


@register_model("dicenet_w2")
def dicenet_w2(**kwargs):
    return get_dicenet(width_scale=2.0, **kwargs)
