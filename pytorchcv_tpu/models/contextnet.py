"""ContextNet, TPU-native. Behavioral reference: pytorchcv
``models/contextnet.py`` (CtxShallowNet:14, LinearBottleneck:67,
CtxDeepNet:118, FeatureFusion:167, CtxHead:225, CtxAuxHead:267,
ContextNet:309, ctxnet_cityscapes:388)."""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import (InterpolationBlock, Sequential, conv1x1, conv1x1_block,
                  conv3x3_block, dwconv3x3_block, dwsconv3x3_block)
from ..nn.base import Composed
from .registry import register_model

__all__ = ["ContextNet", "get_ctxnet"]


class CtxShallowNet(nn.Module):
    """Spatial detail encoder (reference contextnet.py:14)."""

    mid1_channels: int = 32
    mid2_channels: int = 64
    out_channels: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.mid1_channels, stride=2,
                          padding=0, name="conv1")(x, train=train)
        x = dwsconv3x3_block(out_channels=self.mid2_channels, stride=2,
                             name="conv2")(x, train=train)
        x = dwsconv3x3_block(out_channels=self.out_channels, stride=2,
                             name="conv3")(x, train=train)
        return dwsconv3x3_block(out_channels=self.out_channels,
                                name="conv4")(x, train=train)


class CtxLinearBottleneck(nn.Module):
    """MobileNetV2-style unit with ``block`` nesting
    (reference contextnet.py:67)."""

    out_channels: int = 0
    stride: int = 1
    expansion: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        residual = (in_channels == self.out_channels) and (self.stride == 1)
        identity = x
        mid_channels = in_channels * 6 if self.expansion else in_channels
        x = Sequential(layers=(
            conv1x1_block(out_channels=mid_channels, name="0", parent=None),
            dwconv3x3_block(out_channels=mid_channels, stride=self.stride,
                            name="1", parent=None),
            conv1x1_block(out_channels=self.out_channels, activation=None,
                          name="2", parent=None),
        ), name="block")(x, train=train)
        if residual:
            x = x + identity
        return x


class CtxDeepNet(nn.Module):
    """Low-resolution context encoder (reference contextnet.py:118)."""

    init_block_channels: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        layers = [1, 1, 3, 3, 2, 2]
        channels_per_layers = [32, 32, 48, 64, 96, 128]
        downsample = [0, 0, 1, 1, 0, 0]
        blocks = [conv3x3_block(out_channels=self.init_block_channels,
                                stride=2, padding=0, name="init_block",
                                parent=None)]
        for i, out_channels in enumerate(channels_per_layers):
            units = []
            for j in range(layers[i]):
                stride = 2 if (j == 0) and (downsample[i] == 1) else 1
                units.append(CtxLinearBottleneck(
                    out_channels=out_channels, stride=stride,
                    expansion=(i != 0), name=f"unit{j + 1}", parent=None))
            blocks.append(Sequential(layers=tuple(units),
                                     name=f"stage{i + 1}", parent=None))
        return Sequential(layers=tuple(blocks),
                          name="features")(x, train=train)


class CtxFeatureFusion(nn.Module):
    """High/low fusion (reference contextnet.py:167)."""

    out_channels: int = 128

    @nn.compact
    def __call__(self, x_high, x_low, train: bool = False):
        x_high = conv1x1_block(out_channels=self.out_channels, bias=True,
                               activation=None,
                               name="conv_high")(x_high, train=train)
        x_low = InterpolationBlock(align_corners=True)(
            x_low, size=(4 * x_low.shape[1], 4 * x_low.shape[2]))
        x_low = dwconv3x3_block(out_channels=self.out_channels,
                                name="dw_conv_low")(x_low, train=train)
        x_low = conv1x1_block(out_channels=self.out_channels, bias=True,
                              activation=None,
                              name="pw_conv_low")(x_low, train=train)
        return nn.relu(x_high + x_low)


class CtxHead(nn.Module):
    """Classifier head (reference contextnet.py:225)."""

    num_classes: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        x = dwsconv3x3_block(out_channels=in_channels,
                             name="conv1")(x, train=train)
        x = dwsconv3x3_block(out_channels=in_channels,
                             name="conv2")(x, train=train)
        if train:
            x = nn.Dropout(rate=0.1, deterministic=False)(x)
        return conv1x1(out_channels=self.num_classes, bias=True,
                       name="conv3")(x)


class CtxAuxHead(nn.Module):
    """Aux head (reference contextnet.py:267)."""

    mid_channels: int = 32
    num_classes: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.mid_channels,
                          name="conv1")(x, train=train)
        if train:
            x = nn.Dropout(rate=0.1, deterministic=False)(x)
        return conv1x1(out_channels=self.num_classes, bias=True,
                       name="conv2")(x)


class ContextNet(Composed):
    """ContextNet (reference contextnet.py:309)."""

    aux: bool = False
    fixed_size: bool = False
    in_size: Tuple[int, int] = (1024, 2048)
    in_channels: int = 3
    num_classes: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        x_high = CtxShallowNet(name="features_high")(x, train=train)
        x_low = InterpolationBlock(align_corners=True, up=False)(
            x, size=(x.shape[1] // 4, x.shape[2] // 4))
        x_low = CtxDeepNet(name="features_low")(x_low, train=train)
        y = CtxFeatureFusion(out_channels=128,
                             name="fusion")(x_high, x_low, train=train)
        y = CtxHead(num_classes=self.num_classes, name="head")(y,
                                                               train=train)
        y = InterpolationBlock(align_corners=True)(
            y, size=(8 * y.shape[1], 8 * y.shape[2]))
        if self.aux:
            a = CtxAuxHead(mid_channels=32, num_classes=self.num_classes,
                           name="aux_head")(x_high, train=train)
            a = InterpolationBlock(align_corners=True)(
                a, size=(8 * a.shape[1], 8 * a.shape[2]))
            return y, a
        return y


def get_ctxnet(**kwargs):
    """Config expander (reference contextnet.py:356)."""
    return ContextNet(**kwargs)


@register_model("ctxnet_cityscapes")
def ctxnet_cityscapes(num_classes: int = 19, **kwargs):
    return get_ctxnet(num_classes=num_classes, **kwargs)
