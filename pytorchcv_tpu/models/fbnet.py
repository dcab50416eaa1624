"""FBNet-C, TPU-native. Behavioral reference: pytorchcv
``models/fbnet.py`` (FBNetUnit:15, FBNetInitBlock:76, FBNet:125,
get_fbnet:215)."""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import (Sequential, conv1x1_block, conv3x3_block, dwconv3x3_block,
                  dwconv5x5_block, global_avg_pool2d, lambda_batchnorm2d,
                  lambda_relu)
from ..nn.base import IntPair, dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["FBNet", "get_fbnet"]


class FBNetUnit(nn.Module):
    """exp 1x1 -> dw 3/5 -> pw 1x1 (reference fbnet.py:15)."""

    out_channels: int = 0
    stride: IntPair = 1
    use_kernel3: bool = True
    exp_factor: int = 1
    normalization: object = lambda_batchnorm2d()
    activation: object = lambda_relu()

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        residual = (in_channels == self.out_channels) and (self.stride == 1)
        mid_channels = self.exp_factor * in_channels
        identity = x
        x = conv1x1_block(out_channels=mid_channels,
                          normalization=self.normalization,
                          activation=self.activation, name="exp_conv")(
                              x, train=train)
        dw = dwconv3x3_block if self.use_kernel3 else dwconv5x5_block
        x = dw(out_channels=mid_channels, stride=self.stride,
               normalization=self.normalization,
               activation=self.activation, name="conv1")(x, train=train)
        x = conv1x1_block(out_channels=self.out_channels,
                          normalization=self.normalization, activation=None,
                          name="conv2")(x, train=train)
        if residual:
            x = x + identity
        return x


class FBNetInitBlock(nn.Module):
    """conv/2 + exp-1 unit (reference fbnet.py:76)."""

    out_channels: int = 0
    normalization: object = lambda_batchnorm2d()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.out_channels, stride=2,
                          normalization=self.normalization,
                          name="conv1")(x, train=train)
        x = FBNetUnit(out_channels=self.out_channels, stride=1,
                      use_kernel3=True, exp_factor=1,
                      normalization=self.normalization, name="conv2")(
                          x, train=train)
        return x


def FBNet(channels, init_block_channels: int, final_block_channels: int,
          kernels3, exp_factors, bn_eps: float = 1e-5, in_channels: int = 3,
          in_size: Tuple[int, int] = (224, 224),
          num_classes: int = 1000) -> ImageClassifier:
    """FBNet (reference fbnet.py:125)."""
    normalization = lambda_batchnorm2d(eps=bn_eps)
    layers = [FBNetInitBlock(out_channels=init_block_channels,
                             normalization=normalization,
                             name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            units.append(FBNetUnit(
                out_channels=out_channels, stride=2 if (j == 0) else 1,
                use_kernel3=kernels3[i][j] == 1,
                exp_factor=exp_factors[i][j], normalization=normalization,
                name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(conv1x1_block(out_channels=final_block_channels,
                                normalization=normalization,
                                name="final_block"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_fbnet(version: str, bn_eps: float = 1e-5, **kwargs):
    """Config expander (reference fbnet.py:215)."""
    if version != "c":
        raise ValueError(f"Unsupported FBNet version {version}")
    init_block_channels = 16
    final_block_channels = 1984
    channels = [[24, 24, 24], [32, 32, 32, 32],
                [64, 64, 64, 64, 112, 112, 112, 112],
                [184, 184, 184, 184, 352]]
    kernels3 = [[1, 1, 1], [0, 0, 0, 1], [0, 0, 0, 0, 0, 0, 0, 0],
                [0, 0, 0, 0, 1]]
    exp_factors = [[6, 1, 1], [6, 3, 6, 6], [6, 3, 6, 6, 6, 6, 6, 3],
                   [6, 6, 6, 6, 6]]
    return FBNet(channels=channels,
                 init_block_channels=init_block_channels,
                 final_block_channels=final_block_channels,
                 kernels3=kernels3, exp_factors=exp_factors, bn_eps=bn_eps,
                 **kwargs)


@register_model("fbnet_cb")
def fbnet_cb(**kwargs):
    return get_fbnet(version="c", bn_eps=1e-3, **kwargs)
