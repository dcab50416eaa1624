"""SE-ResNeXt, TPU-native. Behavioral reference: pytorchcv
``models/seresnext.py`` (SEResNeXtUnit:17, SEResNeXt:53)."""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import SEBlock, Sequential, conv1x1_block, global_avg_pool2d
from ..nn.base import IntPair, dense_kernel_init
from .registry import register_model
from .resnet import ResInitBlock
from .resnext import ResNeXtBottleneck
from .shell import ImageClassifier

__all__ = ["SEResNeXt", "SEResNeXtUnit", "get_seresnext"]


class SEResNeXtUnit(nn.Module):
    """ResNeXt unit + SE gate (reference seresnext.py:17)."""

    out_channels: int = 0
    stride: IntPair = 1
    cardinality: int = 32
    bottleneck_width: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        resize_identity = (x.shape[-1] != self.out_channels) or \
            (self.stride != 1)
        if resize_identity:
            identity = conv1x1_block(out_channels=self.out_channels,
                                     stride=self.stride, activation=None,
                                     name="identity_conv")(x, train=train)
        else:
            identity = x
        x = ResNeXtBottleneck(out_channels=self.out_channels,
                              stride=self.stride,
                              cardinality=self.cardinality,
                              bottleneck_width=self.bottleneck_width,
                              name="body")(x, train=train)
        x = SEBlock(channels=self.out_channels, name="se")(x)
        return nn.relu(x + identity)


def SEResNeXt(channels, init_block_channels: int, cardinality: int,
              bottleneck_width: int, in_channels: int = 3,
              in_size: Tuple[int, int] = (224, 224),
              num_classes: int = 1000) -> ImageClassifier:
    """SE-ResNeXt (reference seresnext.py:53)."""
    layers = [ResInitBlock(out_channels=init_block_channels,
                           name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(SEResNeXtUnit(
                out_channels=out_channels, stride=stride,
                cardinality=cardinality, bottleneck_width=bottleneck_width,
                name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_seresnext(blocks: int, cardinality: int, bottleneck_width: int,
                  **kwargs):
    """Config expander (reference seresnext.py:~150)."""
    layers_table = {50: [3, 4, 6, 3], 101: [3, 4, 23, 3]}
    if blocks not in layers_table:
        raise ValueError(f"Unsupported SE-ResNeXt blocks: {blocks}")
    layers = layers_table[blocks]
    channels_per_layers = [256, 512, 1024, 2048]
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    return SEResNeXt(channels=channels, init_block_channels=64,
                     cardinality=cardinality,
                     bottleneck_width=bottleneck_width, **kwargs)


def _variant(name, blocks, cardinality, bottleneck_width):
    @register_model(name)
    def ctor(**kwargs):
        return get_seresnext(blocks=blocks, cardinality=cardinality,
                             bottleneck_width=bottleneck_width, **kwargs)
    ctor.__name__ = name
    return ctor


seresnext50_32x4d = _variant("seresnext50_32x4d", 50, 32, 4)
seresnext101_32x4d = _variant("seresnext101_32x4d", 101, 32, 4)
seresnext101_64x4d = _variant("seresnext101_64x4d", 101, 64, 4)
