"""ResNeSt(A), TPU-native. Behavioral reference: pytorchcv
``models/resnesta.py`` (ResNeStABlock:16, ResNeStABottleneck:67,
ResNeStADownBlock:119, ResNeStAUnit:152, ResNeStA:208, get_resnesta:302).
Split-attention conv from ``nn.att`` (reference common/att.py:192-300)."""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import (Sequential, avg_pool2d, conv1x1_block, conv3x3_block,
                  global_avg_pool2d, saconv3x3_block)
from .registry import register_model
from .senet import SEInitBlock
from .seresnet import _LAYER_TABLE  # same blocks->layers mapping
from .shell import ImageClassifier
from .inceptionv3 import DropoutDense

__all__ = ["ResNeStA", "get_resnesta", "ResNeStADownBlock", "ResNeStAUnit"]


class ResNeStADownBlock(nn.Module):
    """avg-pool (ceil, exclude pad) + 1x1 conv identity downsample
    (reference resnesta.py:119)."""

    out_channels: int = 0
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = avg_pool2d(self.stride, self.stride, ceil_mode=True,
                       count_include_pad=False)(x)
        return conv1x1_block(out_channels=self.out_channels, activation=None,
                             name="conv")(x, train=train)


class ResNeStAUnit(nn.Module):
    """ResNeSt(A) unit (reference resnesta.py:152)."""

    out_channels: int = 0
    stride: int = 1
    bottleneck: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        resize_identity = (in_channels != self.out_channels) or \
            (self.stride != 1)
        if resize_identity:
            identity = ResNeStADownBlock(
                out_channels=self.out_channels, stride=self.stride,
                name="identity_block")(x, train=train)
        else:
            identity = x
        body = []
        if self.bottleneck:
            mid_channels = self.out_channels // 4
            body.append(conv1x1_block(out_channels=mid_channels,
                                      name="conv1", parent=None))
            body.append(saconv3x3_block(out_channels=mid_channels,
                                        name="conv2", parent=None))
            if self.stride > 1:
                body.append(avg_pool2d(3, self.stride, padding=1))
            body.append(conv1x1_block(out_channels=self.out_channels,
                                      activation=None, name="conv3",
                                      parent=None))
        else:
            body.append(conv3x3_block(out_channels=self.out_channels,
                                      name="conv1", parent=None))
            if self.stride > 1:
                body.append(avg_pool2d(3, self.stride, padding=1))
            body.append(saconv3x3_block(out_channels=self.out_channels,
                                        activation=None, name="conv2",
                                        parent=None))
        x = Sequential(layers=tuple(body), name="body")(x, train=train)
        return nn.relu(x + identity)


def ResNeStA(channels, init_block_channels: int, bottleneck: bool,
             dropout_rate: float = 0.0, in_channels: int = 3,
             in_size: Tuple[int, int] = (224, 224),
             num_classes: int = 1000) -> ImageClassifier:
    """ResNeSt(A) (reference resnesta.py:208)."""
    layers = [SEInitBlock(out_channels=init_block_channels,
                          name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(ResNeStAUnit(out_channels=out_channels,
                                      stride=stride, bottleneck=bottleneck,
                                      name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=DropoutDense(num_classes=num_classes,
                            dropout_rate=dropout_rate, name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_resnesta(blocks: int, bottleneck: bool = None,
                 width_scale: float = 1.0, **kwargs):
    """Config expander (reference resnesta.py:302)."""
    if bottleneck is None:
        bottleneck = (blocks >= 50)
    extra = {200: [3, 24, 36, 3], 269: [3, 30, 48, 8]}
    key = (blocks, bool(bottleneck))
    if blocks in extra:
        layers = extra[blocks]
    elif key in _LAYER_TABLE:
        layers = _LAYER_TABLE[key]
    else:
        raise ValueError(f"Unsupported ResNeSt(A) blocks: {blocks}")
    init_block_channels = 64
    channels_per_layers = [64, 128, 256, 512]
    if blocks >= 101:
        init_block_channels *= 2
    if bottleneck:
        channels_per_layers = [ci * 4 for ci in channels_per_layers]
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    if width_scale != 1.0:
        channels = [[int(cij * width_scale)
                     if (i != len(channels) - 1) or (j != len(ci) - 1)
                     else cij for j, cij in enumerate(ci)]
                    for i, ci in enumerate(channels)]
        init_block_channels = int(init_block_channels * width_scale)
    return ResNeStA(channels=channels,
                    init_block_channels=init_block_channels,
                    bottleneck=bottleneck, **kwargs)


@register_model("resnestabc14")
def resnestabc14(**kwargs):
    return get_resnesta(blocks=14, bottleneck=True, **kwargs)


@register_model("resnesta18")
def resnesta18(**kwargs):
    return get_resnesta(blocks=18, **kwargs)


@register_model("resnestabc26")
def resnestabc26(**kwargs):
    return get_resnesta(blocks=26, bottleneck=True, **kwargs)


@register_model("resnesta50")
def resnesta50(**kwargs):
    return get_resnesta(blocks=50, **kwargs)


@register_model("resnesta101")
def resnesta101(**kwargs):
    return get_resnesta(blocks=101, **kwargs)


@register_model("resnesta152")
def resnesta152(**kwargs):
    return get_resnesta(blocks=152, **kwargs)


@register_model("resnesta200")
def resnesta200(in_size=(256, 256), **kwargs):
    return get_resnesta(blocks=200, in_size=in_size, **kwargs)


@register_model("resnesta269")
def resnesta269(in_size=(320, 320), **kwargs):
    return get_resnesta(blocks=269, in_size=in_size, **kwargs)
