"""BagNet, TPU-native. Behavioral reference: pytorchcv ``models/bagnet.py``
(BagNetBottleneck:12, BagNetUnit:58, BagNetInitBlock:104, BagNet:133,
get_bagnet:215). Limited receptive field: body convs use padding=0, so the
identity is cropped to the body's (smaller) spatial extent before the add."""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import (ConvBlock, Sequential, conv1x1, conv1x1_block,
                  conv3x3_block, global_avg_pool2d)
from ..nn.base import dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["BagNet", "get_bagnet"]


class BagNetUnit(nn.Module):
    """Residual unit with unpadded body convs (reference bagnet.py:58)."""

    out_channels: int = 0
    kernel_size: int = 3
    stride: int = 1

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
        mid_channels = self.out_channels // 4
        y = Sequential(layers=(
            conv1x1_block(out_channels=mid_channels, name="conv1",
                          parent=None),
            ConvBlock(out_channels=mid_channels,
                      kernel_size=self.kernel_size, stride=self.stride,
                      padding=0, name="conv2", parent=None),
            conv1x1_block(out_channels=self.out_channels, activation=None,
                          name="conv3", parent=None),
        ), name="body")(x, train=train)
        # Crop identity to the body's spatial size (reference bagnet.py:95-97
        # crops the trailing rows/cols).
        if y.shape[1] != identity.shape[1] or y.shape[2] != identity.shape[2]:
            identity = identity[:, :y.shape[1], :y.shape[2], :]
        y = y + identity
        return nn.relu(y)


class BagNetInitBlock(nn.Module):
    """1x1 conv + unpadded 3x3 block stem (reference bagnet.py:104)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv1x1(out_channels=self.out_channels, name="conv1")(x)
        x = conv3x3_block(out_channels=self.out_channels, padding=0,
                          name="conv2")(x, train=train)
        return x


def BagNet(channels, init_block_channels: int, final_pool_size: int,
           normal_kernel_sizes, in_channels: int = 3,
           in_size: Tuple[int, int] = (224, 224),
           num_classes: int = 1000) -> ImageClassifier:
    """BagNet (reference bagnet.py:133)."""
    del final_pool_size  # global average pool over the remaining extent
    layers = [BagNetInitBlock(out_channels=init_block_channels,
                              name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != len(channels) - 1) else 1
            kernel_size = 3 if j < normal_kernel_sizes[i] else 1
            units.append(BagNetUnit(out_channels=out_channels,
                                    kernel_size=kernel_size, stride=stride,
                                    name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_bagnet(field: int, **kwargs):
    """Config expander (reference bagnet.py:215)."""
    layers = [3, 4, 6, 3]
    if field == 9:
        normal_kernel_sizes = [1, 1, 0, 0]
        final_pool_size = 27
    elif field == 17:
        normal_kernel_sizes = [1, 1, 1, 0]
        final_pool_size = 26
    elif field == 33:
        normal_kernel_sizes = [1, 1, 1, 1]
        final_pool_size = 24
    else:
        raise ValueError(f"Unsupported BagNet with field: {field}")
    channels = [[ci] * li for ci, li in
                zip([256, 512, 1024, 2048], layers)]
    return BagNet(channels=channels, init_block_channels=64,
                  final_pool_size=final_pool_size,
                  normal_kernel_sizes=normal_kernel_sizes, **kwargs)


@register_model("bagnet9")
def bagnet9(**kwargs):
    return get_bagnet(field=9, **kwargs)


@register_model("bagnet17")
def bagnet17(**kwargs):
    return get_bagnet(field=17, **kwargs)


@register_model("bagnet33")
def bagnet33(**kwargs):
    return get_bagnet(field=33, **kwargs)
