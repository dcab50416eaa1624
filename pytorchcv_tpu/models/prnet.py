"""PRNet for AFLW2000-3D (3D face reconstruction / dense alignment),
TPU-native (JAX/flax, NHWC).

Behavioral reference: pytorchcv ``models/prnet.py`` (conv4x4_block:14,
deconv4x4_block:60, PRResBottleneck:113, PRResUnit:170, PROutputBlock:220,
PRNet:266, get_prnet:369) from 'Joint 3D Face Reconstruction and Dense
Alignment with Position Map Regression Network'
https://arxiv.org/abs/1803.07835.

Position-map regression: (B, 256, 256, 3) image -> (B, 256, 256, 3) UV
position map. The 4x4 convs carry the reference's asymmetric (1,2,1,2)
padding; the decoder's stride-1 deconvs use the ext-pad + crop trick."""

from __future__ import annotations

from typing import Any, Tuple

from flax import linen as nn

from ..nn import (ConvBlock, DeconvBlock, NormActivation, Sequential,
                  conv1x1, conv1x1_block, lambda_batchnorm2d,
                  lambda_sigmoid)
from ..nn.base import IntPair
from .registry import register_model

__all__ = ["PRNet", "get_prnet"]


def conv4x4_block(padding=(1, 2, 1, 2), **kwargs) -> ConvBlock:
    """4x4 conv block (reference prnet.py:14)."""
    return ConvBlock(kernel_size=4, padding=padding, **kwargs)


def deconv4x4_block(stride=1, padding=3, ext_padding=(2, 1, 2, 1),
                    **kwargs) -> DeconvBlock:
    """4x4 deconv block, stride 1 by default (reference prnet.py:60)."""
    return DeconvBlock(kernel_size=4, stride=stride, padding=padding,
                       ext_padding=ext_padding, **kwargs)


class PRResBottleneck(nn.Module):
    """1x1 -> 4x4 -> raw 1x1 bottleneck (reference prnet.py:113)."""

    out_channels: int = 0
    stride: IntPair = 1
    padding: Any = 1
    normalization: Any = lambda_batchnorm2d()
    bottleneck_factor: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = self.out_channels // self.bottleneck_factor
        x = conv1x1_block(out_channels=mid_channels,
                          normalization=self.normalization, name="conv1")(
                              x, train=train)
        x = conv4x4_block(out_channels=mid_channels, stride=self.stride,
                          padding=self.padding,
                          normalization=self.normalization, name="conv2")(
                              x, train=train)
        return conv1x1(out_channels=self.out_channels, name="conv3")(x)


class PRResUnit(nn.Module):
    """Residual unit with post-add norm-activation (reference
    prnet.py:170)."""

    out_channels: int = 0
    stride: IntPair = 1
    padding: Any = 1
    normalization: Any = lambda_batchnorm2d()

    @nn.compact
    def __call__(self, x, train: bool = False):
        resize_identity = (x.shape[-1] != self.out_channels) or \
            (self.stride != 1)
        if resize_identity:
            identity = conv1x1(out_channels=self.out_channels,
                               stride=self.stride, name="identity_conv")(x)
        else:
            identity = x
        x = PRResBottleneck(out_channels=self.out_channels,
                            stride=self.stride, padding=self.padding,
                            normalization=self.normalization, name="body")(
                                x, train=train)
        x = x + identity
        return NormActivation(normalization=self.normalization,
                              name="norm_activ")(x, train=train)


class PROutputBlock(nn.Module):
    """Three stride-1 deconv blocks, sigmoid-activated last (reference
    prnet.py:220)."""

    out_channels: int = 3
    normalization: Any = lambda_batchnorm2d()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = deconv4x4_block(out_channels=self.out_channels,
                            normalization=self.normalization,
                            name="conv1")(x, train=train)
        x = deconv4x4_block(out_channels=self.out_channels,
                            normalization=self.normalization,
                            name="conv2")(x, train=train)
        return deconv4x4_block(out_channels=self.out_channels,
                               normalization=self.normalization,
                               activation=lambda_sigmoid(), name="conv3")(
                                   x, train=train)


class PRNet(nn.Module):
    """PRNet (reference prnet.py:266)."""

    channels: Any = ()
    init_block_channels: int = 16
    bn_eps: float = 1e-5
    in_channels: int = 3
    in_size: Tuple[int, int] = (256, 256)
    num_classes: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        normalization = lambda_batchnorm2d(eps=self.bn_eps)
        enc_stages = []
        for i, channels_per_stage in enumerate(self.channels[0]):
            units = []
            for j, out_channels in enumerate(channels_per_stage):
                stride = 2 if j == 0 else 1
                units.append(PRResUnit(
                    out_channels=out_channels, stride=stride,
                    padding=((1, 2, 1, 2) if stride == 1 else 1),
                    normalization=normalization, name=f"unit{j + 1}",
                    parent=None))
            enc_stages.append(Sequential(layers=tuple(units),
                                         name=f"stage{i + 1}", parent=None))
        dec_stages = []
        for i, channels_per_stage in enumerate(self.channels[1]):
            units = []
            for j, out_channels in enumerate(channels_per_stage):
                stride = 2 if (j == 0) and (i != 0) else 1
                units.append(deconv4x4_block(
                    out_channels=out_channels, stride=stride,
                    padding=(3 if stride == 1 else 1),
                    ext_padding=((2, 1, 2, 1) if stride == 1 else None),
                    normalization=normalization, name=f"unit{j + 1}",
                    parent=None))
            dec_stages.append(Sequential(layers=tuple(units),
                                         name=f"stage{i + 1}", parent=None))
        x = Sequential(layers=(
            conv4x4_block(out_channels=self.init_block_channels,
                          normalization=normalization, name="init_block",
                          parent=None),
            Sequential(layers=tuple(enc_stages), name="encoder",
                       parent=None),
            Sequential(layers=tuple(dec_stages), name="decoder",
                       parent=None),
        ), name="features")(x, train=train)
        return PROutputBlock(out_channels=self.num_classes,
                             normalization=normalization, name="output")(
                                 x, train=train)


def get_prnet(**kwargs) -> PRNet:
    """Config expander (reference prnet.py:369)."""
    init_block_channels = 16
    enc_channels = [[32, 32], [64, 64], [128, 128], [256, 256], [512, 512]]
    dec_channels = [[512], [256, 256, 256], [128, 128, 128], [64, 64, 64],
                    [32, 32], [16, 16]]
    channels = (tuple(tuple(c) for c in enc_channels),
                tuple(tuple(c) for c in dec_channels))
    return PRNet(channels=channels,
                 init_block_channels=init_block_channels, **kwargs)


@register_model("prnet")
def prnet(**kwargs):
    kwargs.setdefault("bn_eps", 1e-3)
    return get_prnet(**kwargs)
