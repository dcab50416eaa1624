"""GhostNet, TPU-native. Behavioral reference: pytorchcv
``models/ghostnet.py`` (GhostHSigmoid:18, GhostConvBlock:27, GhostExpBlock:63,
GhostUnit:124, GhostClassifier:177, GhostNet:209, get_ghostnet:~320)."""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (SEBlock, Sequential, conv1x1, conv1x1_block,
                  conv3x3_block, dwconv3x3_block, dwconv5x5_block,
                  dwsconv3x3_block, global_avg_pool2d, lambda_relu,
                  round_channels)
from ..nn.base import IntPair
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["GhostNet", "get_ghostnet"]


def ghost_hsigmoid(x):
    """clamp(x, 0, 1) (reference ghostnet.py:18)."""
    return jnp.clip(x, 0.0, 1.0)


class GhostConvBlock(nn.Module):
    """main 1x1 + cheap dw3x3, concat (reference ghostnet.py:27)."""

    out_channels: int = 0
    activation: object = lambda_relu()

    @nn.compact
    def __call__(self, x, train: bool = False):
        main_out_channels = math.ceil(0.5 * self.out_channels)
        cheap_out_channels = self.out_channels - main_out_channels
        x = conv1x1_block(out_channels=main_out_channels,
                          activation=self.activation, name="main_conv")(
                              x, train=train)
        y = dwconv3x3_block(out_channels=cheap_out_channels,
                            activation=self.activation, name="cheap_conv")(
                                x, train=train)
        return jnp.concatenate([x, y], axis=-1)


class GhostExpBlock(nn.Module):
    """ghost exp -> [dw] -> [SE] -> ghost pw (reference ghostnet.py:63)."""

    out_channels: int = 0
    stride: IntPair = 1
    use_kernel3: bool = True
    exp_factor: float = 1.0
    use_se: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = int(math.ceil(self.exp_factor * x.shape[-1]))
        x = GhostConvBlock(out_channels=mid_channels, name="exp_conv")(
            x, train=train)
        if self.stride != 1:
            dw = dwconv3x3_block if self.use_kernel3 else dwconv5x5_block
            x = dw(out_channels=mid_channels, stride=self.stride,
                   activation=None, name="dw_conv")(x, train=train)
        if self.use_se:
            x = SEBlock(channels=mid_channels, reduction=4,
                        out_activation=ghost_hsigmoid, name="se")(x)
        x = GhostConvBlock(out_channels=self.out_channels, activation=None,
                           name="pw_conv")(x, train=train)
        return x


class GhostUnit(nn.Module):
    """ghost residual unit (reference ghostnet.py:124)."""

    out_channels: int = 0
    stride: IntPair = 1
    use_kernel3: bool = True
    exp_factor: float = 1.0
    use_se: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        resize_identity = (x.shape[-1] != self.out_channels) or \
            (self.stride != 1)
        if resize_identity:
            identity = dwsconv3x3_block(out_channels=self.out_channels,
                                        stride=self.stride,
                                        pw_activation=None,
                                        name="identity_conv")(x, train=train)
        else:
            identity = x
        x = GhostExpBlock(out_channels=self.out_channels,
                          stride=self.stride, use_kernel3=self.use_kernel3,
                          exp_factor=self.exp_factor, use_se=self.use_se,
                          name="body")(x, train=train)
        return x + identity


class GhostClassifier(nn.Module):
    """1x1 block + 1x1 biased (reference ghostnet.py:177)."""

    out_channels: int = 0
    mid_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv1x1_block(out_channels=self.mid_channels, name="conv1")(
            x, train=train)
        x = conv1x1(out_channels=self.out_channels, bias=True,
                    name="conv2")(x)
        return x


def GhostNet(channels, init_block_channels: int, final_block_channels: int,
             classifier_mid_channels: int, kernels3, exp_factors, use_se,
             first_stride: bool, in_channels: int = 3,
             in_size: Tuple[int, int] = (224, 224),
             num_classes: int = 1000) -> ImageClassifier:
    """GhostNet (reference ghostnet.py:209)."""
    layers = [conv3x3_block(out_channels=init_block_channels, stride=2,
                            name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and ((i != 0) or first_stride) else 1
            units.append(GhostUnit(
                out_channels=out_channels, stride=stride,
                use_kernel3=kernels3[i][j] == 1,
                exp_factor=exp_factors[i][j],
                use_se=use_se[i][j] == 1, name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(conv1x1_block(out_channels=final_block_channels,
                                name="final_block"))
    layers.append(global_avg_pool2d(keepdims=True))
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=GhostClassifier(out_channels=num_classes,
                               mid_channels=classifier_mid_channels,
                               name="output"),
        output_before_flatten=True,
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_ghostnet(width_scale: float = 1.0, **kwargs):
    """Config expander (reference ghostnet.py:~320)."""
    init_block_channels = 16
    channels = [[16], [24, 24], [40, 40], [80, 80, 80, 80, 112, 112],
                [160, 160, 160, 160, 160]]
    kernels3 = [[1], [1, 1], [0, 0], [1, 1, 1, 1, 1, 1], [0, 0, 0, 0, 0]]
    exp_factors = [[1], [3, 3], [3, 3], [6, 2.5, 2.3, 2.3, 6, 6],
                   [6, 6, 6, 6, 6]]
    use_se = [[0], [0, 0], [1, 1], [0, 0, 0, 0, 1, 1], [1, 0, 1, 0, 1]]
    final_block_channels = 960
    classifier_mid_channels = 1280
    first_stride = False

    if width_scale != 1.0:
        channels = [[round_channels(cij * width_scale, divisor=4)
                     for cij in ci] for ci in channels]
        init_block_channels = round_channels(
            init_block_channels * width_scale, divisor=4)
        if width_scale > 1.0:
            final_block_channels = round_channels(
                final_block_channels * width_scale, divisor=4)

    return GhostNet(channels=channels,
                    init_block_channels=init_block_channels,
                    final_block_channels=final_block_channels,
                    classifier_mid_channels=classifier_mid_channels,
                    kernels3=kernels3, exp_factors=exp_factors,
                    use_se=use_se, first_stride=first_stride, **kwargs)


@register_model("ghostnet")
def ghostnet(**kwargs):
    return get_ghostnet(**kwargs)
