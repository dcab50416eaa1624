"""SCNet, TPU-native. Behavioral reference: pytorchcv ``models/scnet.py``
(ScDownBlock:16, ScConv:50, ScBottleneck:96, ScUnit:175, SCNet:230,
get_scnet:298). Self-calibrated conv: a pooled branch gates the main conv
via sigmoid."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (InterpolationBlock, Sequential, avg_pool2d, conv1x1_block,
                  conv3x3_block, global_avg_pool2d)
from ..nn.base import dense_kernel_init
from .registry import register_model
from .resnesta import ResNeStADownBlock
from .resnet import ResInitBlock
from .senet import SEInitBlock
from .shell import ImageClassifier

__all__ = ["SCNet", "get_scnet"]


class ScDownBlock(nn.Module):
    """avg-pool + 3x3 conv block (reference scnet.py:16)."""

    out_channels: int = 0
    pool_size: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = avg_pool2d(self.pool_size, self.pool_size)(x)
        return conv3x3_block(out_channels=self.out_channels, activation=None,
                             name="conv")(x, train=train)


class ScConv(nn.Module):
    """Self-calibrated conv (reference scnet.py:50)."""

    out_channels: int = 0
    stride: int = 1
    scale_factor: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        d = ScDownBlock(out_channels=self.out_channels,
                        pool_size=self.scale_factor,
                        name="down")(x, train=train)
        d = InterpolationBlock(scale_factor=self.scale_factor,
                               mode="nearest", align_corners=None)(
            d, size=x.shape[1:3])
        w = nn.sigmoid(x + d)
        y = conv3x3_block(out_channels=in_channels, activation=None,
                          name="conv1")(x, train=train)
        y = y * w
        return conv3x3_block(out_channels=self.out_channels,
                             stride=self.stride,
                             name="conv2")(y, train=train)


class ScBottleneck(nn.Module):
    """Two-branch bottleneck with self-calibration (reference scnet.py:96)."""

    out_channels: int = 0
    stride: int = 1
    scale_factor: int = 4
    avg_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        avg_resize = (self.stride > 1) and self.avg_downsample
        mid_channels = self.out_channels // 4 // 2
        y = conv1x1_block(out_channels=mid_channels,
                          name="conv1a")(x, train=train)
        y = conv3x3_block(out_channels=mid_channels,
                          stride=(1 if avg_resize else self.stride),
                          name="conv2a")(y, train=train)
        z = conv1x1_block(out_channels=mid_channels,
                          name="conv1b")(x, train=train)
        z = ScConv(out_channels=mid_channels,
                   stride=(1 if avg_resize else self.stride),
                   scale_factor=self.scale_factor,
                   name="conv2b")(z, train=train)
        if avg_resize:
            pool = avg_pool2d(3, self.stride, padding=1)
            y, z = pool(y), pool(z)
        x = jnp.concatenate([y, z], axis=-1)
        return conv1x1_block(out_channels=self.out_channels, activation=None,
                             name="conv3")(x, train=train)


class ScUnit(nn.Module):
    """SCNet residual unit (reference scnet.py:175)."""

    out_channels: int = 0
    stride: int = 1
    avg_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        resize_identity = (in_channels != self.out_channels) or \
            (self.stride != 1)
        if resize_identity:
            if self.avg_downsample:
                identity = ResNeStADownBlock(
                    out_channels=self.out_channels, stride=self.stride,
                    name="identity_block")(x, train=train)
            else:
                identity = conv1x1_block(
                    out_channels=self.out_channels, stride=self.stride,
                    activation=None, name="identity_block")(x, train=train)
        else:
            identity = x
        x = ScBottleneck(out_channels=self.out_channels, stride=self.stride,
                         avg_downsample=self.avg_downsample,
                         name="body")(x, train=train)
        return nn.relu(x + identity)


def SCNet(channels, init_block_channels: int, se_init_block: bool = False,
          avg_downsample: bool = False, in_channels: int = 3,
          in_size: Tuple[int, int] = (224, 224),
          num_classes: int = 1000) -> ImageClassifier:
    """SCNet (reference scnet.py:230)."""
    init_cls = SEInitBlock if se_init_block else ResInitBlock
    layers = [init_cls(out_channels=init_block_channels, name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(ScUnit(out_channels=out_channels, stride=stride,
                                avg_downsample=avg_downsample,
                                name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_scnet(blocks: int, width_scale: float = 1.0,
              se_init_block: bool = False, avg_downsample: bool = False,
              init_block_channels_scale: int = 1, **kwargs):
    """Config expander (reference scnet.py:298)."""
    table = {14: [1, 1, 1, 1], 26: [2, 2, 2, 2], 38: [3, 3, 3, 3],
             50: [3, 4, 6, 3], 101: [3, 4, 23, 3], 152: [3, 8, 36, 3],
             200: [3, 24, 36, 3]}
    if blocks not in table:
        raise ValueError(f"Unsupported SCNet blocks: {blocks}")
    layers = table[blocks]
    init_block_channels = 64 * init_block_channels_scale
    channels_per_layers = [ci * 4 for ci in [64, 128, 256, 512]]
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    if width_scale != 1.0:
        channels = [[int(cij * width_scale)
                     if (i != len(channels) - 1) or (j != len(ci) - 1)
                     else cij for j, cij in enumerate(ci)]
                    for i, ci in enumerate(channels)]
        init_block_channels = int(init_block_channels * width_scale)
    return SCNet(channels=channels, init_block_channels=init_block_channels,
                 se_init_block=se_init_block, avg_downsample=avg_downsample,
                 **kwargs)


@register_model("scnet50")
def scnet50(**kwargs):
    return get_scnet(blocks=50, **kwargs)


@register_model("scnet101")
def scnet101(**kwargs):
    return get_scnet(blocks=101, **kwargs)


@register_model("scneta50")
def scneta50(**kwargs):
    return get_scnet(blocks=50, se_init_block=True, avg_downsample=True,
                     **kwargs)


@register_model("scneta101")
def scneta101(**kwargs):
    return get_scnet(blocks=101, se_init_block=True, avg_downsample=True,
                     init_block_channels_scale=2, **kwargs)
