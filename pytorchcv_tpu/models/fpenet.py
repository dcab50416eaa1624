"""FPENet, TPU-native. Behavioral reference: pytorchcv ``models/fpenet.py``
(FPEBlock:15, FPEUnit:57, FPEStage:125, MEUBlock:184, FPENet:256,
get_fpenet:336)."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (InterpolationBlock, SEBlock, Sequential, conv1x1,
                  conv1x1_block, conv3x3_block)
from ..nn.base import Composed
from .registry import register_model

__all__ = ["FPENet", "get_fpenet"]


class FPESubBlocks(nn.Module):
    """The chained dilated depthwise stack (torch ``blocks``,
    reference fpenet.py:30-44)."""

    channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        dilations = [1, 2, 4, 8]
        mid_channels = self.channels // len(dilations)
        xs = jnp.split(x, len(dilations), axis=-1)
        ys = []
        for i, dilation in enumerate(dilations):
            blk = conv3x3_block(out_channels=mid_channels,
                                groups=mid_channels, dilation=dilation,
                                padding=dilation, name=f"block{i + 1}")
            inp = xs[i] if not ys else xs[i] + ys[-1]
            ys.append(blk(inp, train=train))
        return jnp.concatenate(ys, axis=-1)


class FPEBlock(nn.Module):
    """Chained dilated depthwise pyramid (reference fpenet.py:15)."""

    channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        return FPESubBlocks(channels=self.channels,
                            name="blocks")(x, train=train)


class FPEUnit(nn.Module):
    """FPE residual unit (reference fpenet.py:57)."""

    out_channels: int = 0
    stride: int = 1
    bottleneck_factor: int = 1
    use_se: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        resize_identity = (in_channels != self.out_channels) or \
            (self.stride != 1)
        if resize_identity:
            identity = conv1x1_block(
                out_channels=self.out_channels, stride=self.stride,
                activation=None, name="identity_conv")(x, train=train)
        else:
            identity = x
        mid1_channels = in_channels * self.bottleneck_factor
        x = conv1x1_block(out_channels=mid1_channels, stride=self.stride,
                          name="conv1")(x, train=train)
        x = FPEBlock(channels=mid1_channels, name="block")(x, train=train)
        x = conv1x1_block(out_channels=self.out_channels, activation=None,
                          name="conv2")(x, train=train)
        if self.use_se:
            x = SEBlock(channels=self.out_channels, name="se")(x)
        return nn.relu(x + identity)


class FPEStage(nn.Module):
    """Down unit + residual block chain (reference fpenet.py:125)."""

    out_channels: int = 0
    num_layers: int = 1
    use_se: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_block = self.num_layers > 1
        x = FPEUnit(out_channels=self.out_channels,
                    stride=(2 if use_block else 1),
                    bottleneck_factor=(4 if use_block else 1),
                    use_se=self.use_se, name="down")(x, train=train)
        if use_block:
            blocks = tuple(FPEUnit(out_channels=self.out_channels, stride=1,
                                   bottleneck_factor=1, use_se=self.use_se,
                                   name=f"block{i + 1}", parent=None)
                           for i in range(self.num_layers - 1))
            y = Sequential(layers=blocks, name="blocks")(x, train=train)
            x = x + y
        return x


class MEUBlock(nn.Module):
    """Mutual embedding upsample (reference fpenet.py:184)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x_high, x_low, train: bool = False):
        x_high = conv1x1_block(out_channels=self.out_channels,
                               activation=None,
                               name="conv_high")(x_high, train=train)
        x_low = conv1x1_block(out_channels=self.out_channels,
                              activation=None,
                              name="conv_low")(x_low, train=train)
        w_high = x_high.mean(axis=(1, 2), keepdims=True)
        w_high = conv1x1(out_channels=self.out_channels,
                         name="conv_w_high")(w_high)
        w_high = nn.sigmoid(nn.relu(w_high))
        w_low = x_low.mean(axis=-1, keepdims=True)
        w_low = conv1x1(out_channels=1, name="conv_w_low")(w_low)
        w_low = nn.sigmoid(w_low)
        x_high = InterpolationBlock(align_corners=True)(
            x_high, size=(2 * x_high.shape[1], 2 * x_high.shape[2]))
        return x_high * w_low + x_low * w_high


class FPEEncoder(nn.Module):
    """Multi-output stage stack (torch ``encoder`` MultiOutputSequential,
    reference fpenet.py:297-307)."""

    layers: Tuple = ()
    channels: Tuple = ()
    use_se: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for i, (li, oc) in enumerate(zip(self.layers, self.channels)):
            x = FPEStage(out_channels=oc, num_layers=li, use_se=self.use_se,
                         name=f"stage{i + 1}")(x, train=train)
            outs.append(x)
        return outs


class FPENet(Composed):
    """FPENet (reference fpenet.py:256)."""

    layers: Any = None
    channels: Any = None
    init_block_channels: int = 16
    meu_channels: Any = None
    use_se: bool = False
    aux: bool = False
    fixed_size: bool = False
    in_size: Tuple[int, int] = (1024, 2048)
    in_channels: int = 3
    num_classes: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.init_block_channels, stride=2,
                          name="stem")(x, train=train)
        outs = FPEEncoder(layers=tuple(self.layers),
                          channels=tuple(self.channels),
                          use_se=self.use_se, name="encoder")(x, train=train)
        x = MEUBlock(out_channels=self.meu_channels[0],
                     name="meu1")(outs[2], outs[1], train=train)
        x = MEUBlock(out_channels=self.meu_channels[1],
                     name="meu2")(x, outs[0], train=train)
        x = conv1x1(out_channels=self.num_classes, bias=True,
                    name="classifier")(x)
        return InterpolationBlock(align_corners=True)(
            x, size=(2 * x.shape[1], 2 * x.shape[2]))


def get_fpenet(**kwargs):
    """Config expander (reference fpenet.py:336)."""
    width = 16
    channels = [int(width * (2 ** i)) for i in range(3)]
    return FPENet(layers=[1, 3, 9], channels=channels,
                  init_block_channels=width, meu_channels=[64, 32],
                  use_se=False, **kwargs)


@register_model("fpenet_cityscapes")
def fpenet_cityscapes(num_classes: int = 19, **kwargs):
    return get_fpenet(num_classes=num_classes, **kwargs)
