"""Single-Path NASNet, TPU-native. Behavioral reference: pytorchcv
``models/spnasnet.py`` (SPNASUnit:16, SPNASInitBlock:86, SPNASFinalBlock:107,
SPNASNet:147, get_spnasnet:~250)."""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import (Sequential, conv1x1_block, conv3x3_block, dwconv3x3_block,
                  dwconv5x5_block, global_avg_pool2d)
from ..nn.base import IntPair, dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["SPNASNet", "get_spnasnet"]


class SPNASUnit(nn.Module):
    """[exp 1x1] -> dw 3/5 -> pw 1x1 (reference spnasnet.py:16)."""

    out_channels: int = 0
    stride: IntPair = 1
    use_kernel3: bool = True
    exp_factor: int = 1
    use_skip: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        residual = (in_channels == self.out_channels) and \
            (self.stride == 1) and self.use_skip
        mid_channels = self.exp_factor * in_channels
        identity = x
        if self.exp_factor > 1:
            x = conv1x1_block(out_channels=mid_channels, name="exp_conv")(
                x, train=train)
        dw = dwconv3x3_block if self.use_kernel3 else dwconv5x5_block
        x = dw(out_channels=mid_channels, stride=self.stride,
               name="conv1")(x, train=train)
        x = conv1x1_block(out_channels=self.out_channels, activation=None,
                          name="conv2")(x, train=train)
        if residual:
            x = x + identity
        return x


class SPNASInitBlock(nn.Module):
    """conv/2 + exp-1 unit (reference spnasnet.py:86)."""

    out_channels: int = 0
    mid_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.mid_channels, stride=2,
                          name="conv1")(x, train=train)
        x = SPNASUnit(out_channels=self.out_channels, stride=1,
                      use_kernel3=True, exp_factor=1, use_skip=False,
                      name="conv2")(x, train=train)
        return x


class SPNASFinalBlock(nn.Module):
    """exp-6 unit + 1x1 (reference spnasnet.py:107)."""

    out_channels: int = 0
    mid_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SPNASUnit(out_channels=self.mid_channels, stride=1,
                      use_kernel3=True, exp_factor=6, use_skip=False,
                      name="conv1")(x, train=train)
        x = conv1x1_block(out_channels=self.out_channels, name="conv2")(
            x, train=train)
        return x


def SPNASNet(channels, init_block_channels, final_block_channels, kernels3,
             exp_factors, in_channels: int = 3,
             in_size: Tuple[int, int] = (224, 224),
             num_classes: int = 1000) -> ImageClassifier:
    """SPNASNet (reference spnasnet.py:147)."""
    layers = [SPNASInitBlock(out_channels=init_block_channels[1],
                             mid_channels=init_block_channels[0],
                             name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if ((j == 0) and (i != 3)) or \
                ((j == len(channels_per_stage) // 2) and (i == 3)) else 1
            units.append(SPNASUnit(
                out_channels=out_channels, stride=stride,
                use_kernel3=kernels3[i][j] == 1,
                exp_factor=exp_factors[i][j], name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(SPNASFinalBlock(out_channels=final_block_channels[1],
                                  mid_channels=final_block_channels[0],
                                  name="final_block"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_spnasnet(**kwargs):
    """Config expander (reference spnasnet.py:~250)."""
    init_block_channels = [32, 16]
    final_block_channels = [320, 1280]
    channels = [[24, 24, 24], [40, 40, 40, 40], [80, 80, 80, 80],
                [96, 96, 96, 96, 192, 192, 192, 192]]
    kernels3 = [[1, 1, 1], [0, 1, 1, 1], [0, 1, 1, 1],
                [0, 0, 0, 0, 0, 0, 0, 0]]
    exp_factors = [[3, 3, 3], [6, 3, 3, 3], [6, 3, 3, 3],
                   [6, 3, 3, 3, 6, 6, 6, 6]]
    return SPNASNet(channels=channels,
                    init_block_channels=init_block_channels,
                    final_block_channels=final_block_channels,
                    kernels3=kernels3, exp_factors=exp_factors, **kwargs)


@register_model("spnasnet")
def spnasnet(**kwargs):
    return get_spnasnet(**kwargs)
