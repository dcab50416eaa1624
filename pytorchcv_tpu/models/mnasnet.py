"""MnasNet, TPU-native. Behavioral reference: pytorchcv
``models/mnasnet.py`` (DwsExpSEResUnit:16, MnasInitBlock:91,
MnasFinalBlock:127, MnasNet:163, get_mnasnet:262)."""

from __future__ import annotations

from typing import Sequence, Tuple

from flax import linen as nn

from ..nn import (SEBlock, Sequential, conv1x1_block, conv3x3_block,
                  dwconv3x3_block, dwconv5x5_block, global_avg_pool2d,
                  lambda_relu, round_channels)
from ..nn.base import IntPair, dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["MnasNet", "DwsExpSEResUnit", "get_mnasnet"]


class DwsExpSEResUnit(nn.Module):
    """[exp 1x1] -> dw 3/5 -> [SE] -> pw 1x1; optional residual
    (reference mnasnet.py:16)."""

    out_channels: int = 0
    stride: IntPair = 1
    use_kernel3: bool = True
    exp_factor: int = 1
    se_factor: int = 0
    use_skip: bool = True
    activation: object = lambda_relu()

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        residual = (in_channels == self.out_channels) and \
            (self.stride == 1) and self.use_skip
        mid_channels = self.exp_factor * in_channels
        identity = x
        if self.exp_factor > 1:
            x = conv1x1_block(out_channels=mid_channels,
                              activation=self.activation,
                              name="exp_conv")(x, train=train)
        dw = dwconv3x3_block if self.use_kernel3 else dwconv5x5_block
        x = dw(out_channels=mid_channels, stride=self.stride,
               activation=self.activation, name="dw_conv")(x, train=train)
        if self.se_factor > 0:
            x = SEBlock(channels=mid_channels,
                        reduction=self.exp_factor * self.se_factor,
                        round_mid=False, mid_activation=self.activation,
                        name="se")(x)
        x = conv1x1_block(out_channels=self.out_channels, activation=None,
                          name="pw_conv")(x, train=train)
        if residual:
            x = x + identity
        return x


class MnasInitBlock(nn.Module):
    """conv/2 + dws unit (reference mnasnet.py:91)."""

    out_channels: int = 0
    mid_channels: int = 0
    use_skip: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.mid_channels, stride=2,
                          name="conv1")(x, train=train)
        x = DwsExpSEResUnit(out_channels=self.out_channels,
                            use_skip=self.use_skip, name="conv2")(
                                x, train=train)
        return x


class MnasFinalBlock(nn.Module):
    """exp6 dws unit + 1x1 (reference mnasnet.py:127)."""

    out_channels: int = 0
    mid_channels: int = 0
    use_skip: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = DwsExpSEResUnit(out_channels=self.mid_channels, exp_factor=6,
                            use_skip=self.use_skip, name="conv1")(
                                x, train=train)
        x = conv1x1_block(out_channels=self.out_channels, name="conv2")(
            x, train=train)
        return x


def MnasNet(channels, init_block_channels, final_block_channels, kernels3,
            exp_factors, se_factors, init_block_use_skip: bool,
            final_block_use_skip: bool, in_channels: int = 3,
            in_size: Tuple[int, int] = (224, 224),
            num_classes: int = 1000) -> ImageClassifier:
    """MnasNet (reference mnasnet.py:163)."""
    layers = [MnasInitBlock(out_channels=init_block_channels[1],
                            mid_channels=init_block_channels[0],
                            use_skip=init_block_use_skip,
                            name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            units.append(DwsExpSEResUnit(
                out_channels=out_channels,
                stride=2 if (j == 0) else 1,
                use_kernel3=kernels3[i][j] == 1,
                exp_factor=exp_factors[i][j],
                se_factor=se_factors[i][j], name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(MnasFinalBlock(out_channels=final_block_channels[1],
                                 mid_channels=final_block_channels[0],
                                 use_skip=final_block_use_skip,
                                 name="final_block"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_mnasnet(version: str, width_scale: float = 1.0, **kwargs):
    """Config expander (reference mnasnet.py:262)."""
    if version == "b1":
        init_block_channels = [32, 16]
        final_block_channels = [320, 1280]
        channels = [[24, 24, 24], [40, 40, 40], [80, 80, 80, 96, 96],
                    [192, 192, 192, 192]]
        kernels3 = [[1, 1, 1], [0, 0, 0], [0, 0, 0, 1, 1], [0, 0, 0, 0]]
        exp_factors = [[3, 3, 3], [3, 3, 3], [6, 6, 6, 6, 6], [6, 6, 6, 6]]
        se_factors = [[0, 0, 0], [0, 0, 0], [0, 0, 0, 0, 0], [0, 0, 0, 0]]
        init_block_use_skip = False
        final_block_use_skip = False
    elif version == "a1":
        init_block_channels = [32, 16]
        final_block_channels = [320, 1280]
        channels = [[24, 24], [40, 40, 40], [80, 80, 80, 80, 112, 112],
                    [160, 160, 160]]
        kernels3 = [[1, 1], [0, 0, 0], [1, 1, 1, 1, 1, 1], [0, 0, 0]]
        exp_factors = [[6, 6], [3, 3, 3], [6, 6, 6, 6, 6, 6], [6, 6, 6]]
        se_factors = [[0, 0], [4, 4, 4], [0, 0, 0, 0, 4, 4], [4, 4, 4]]
        init_block_use_skip = False
        final_block_use_skip = True
    elif version == "small":
        init_block_channels = [8, 8]
        final_block_channels = [144, 1280]
        channels = [[16], [16, 16], [32, 32, 32, 32, 32, 32, 32],
                    [88, 88, 88]]
        kernels3 = [[1], [1, 1], [0, 0, 0, 0, 1, 1, 1], [0, 0, 0]]
        exp_factors = [[3], [6, 6], [6, 6, 6, 6, 6, 6, 6], [6, 6, 6]]
        se_factors = [[0], [0, 0], [4, 4, 4, 4, 4, 4, 4], [4, 4, 4]]
        init_block_use_skip = True
        final_block_use_skip = True
    else:
        raise ValueError(f"Unsupported MnasNet version {version}")

    if width_scale != 1.0:
        channels = [[round_channels(cij * width_scale) for cij in ci]
                    for ci in channels]
        init_block_channels = [round_channels(c * width_scale)
                               for c in init_block_channels]

    return MnasNet(channels=channels,
                   init_block_channels=init_block_channels,
                   final_block_channels=final_block_channels,
                   kernels3=kernels3, exp_factors=exp_factors,
                   se_factors=se_factors,
                   init_block_use_skip=init_block_use_skip,
                   final_block_use_skip=final_block_use_skip, **kwargs)


@register_model("mnasnet_b1")
def mnasnet_b1(**kwargs):
    return get_mnasnet(version="b1", **kwargs)


@register_model("mnasnet_a1")
def mnasnet_a1(**kwargs):
    return get_mnasnet(version="a1", **kwargs)


@register_model("mnasnet_small")
def mnasnet_small(**kwargs):
    return get_mnasnet(version="small", **kwargs)
