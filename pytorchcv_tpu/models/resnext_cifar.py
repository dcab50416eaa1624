"""ResNeXt for CIFAR/SVHN, TPU-native. Behavioral reference: pytorchcv
``models/resnext_cifar.py`` (CIFARResNeXt:21, get_resnext_cifar:94,
21 variants)."""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import Sequential, conv3x3_block, global_avg_pool2d
from ..nn.base import dense_kernel_init
from .registry import register_model
from .resnext import ResNeXtUnit
from .shell import ImageClassifier

__all__ = ["CIFARResNeXt", "get_resnext_cifar"]


def CIFARResNeXt(channels, init_block_channels: int, cardinality: int,
                 bottleneck_width: int, in_channels: int = 3,
                 in_size: Tuple[int, int] = (32, 32),
                 num_classes: int = 10) -> ImageClassifier:
    """CIFAR ResNeXt (reference resnext_cifar.py:21)."""
    layers = [conv3x3_block(out_channels=init_block_channels,
                            name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(ResNeXtUnit(
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


def get_resnext_cifar(num_classes: int, blocks: int, cardinality: int,
                      bottleneck_width: int, **kwargs):
    """Config expander (reference resnext_cifar.py:94)."""
    assert num_classes in (10, 100)
    assert (blocks - 2) % 9 == 0
    layers = [(blocks - 2) // 9] * 3
    channels_per_layers = [256, 512, 1024]
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    return CIFARResNeXt(channels=channels, init_block_channels=64,
                        cardinality=cardinality,
                        bottleneck_width=bottleneck_width,
                        num_classes=num_classes, **kwargs)


def _variant(name, blocks, cardinality, width, classes):
    @register_model(name)
    def ctor(num_classes: int = classes, **kwargs):
        return get_resnext_cifar(num_classes=num_classes, blocks=blocks,
                                 cardinality=cardinality,
                                 bottleneck_width=width, **kwargs)
    ctor.__name__ = name
    return ctor


for _blocks, _c, _w, _tag in [
        (20, 16, 4, "20_16x4d"), (20, 32, 2, "20_32x2d"),
        (20, 32, 4, "20_32x4d"), (29, 32, 4, "29_32x4d"),
        (29, 16, 64, "29_16x64d"), (272, 1, 64, "272_1x64d"),
        (272, 2, 32, "272_2x32d")]:
    for _ds, _classes in [("cifar10", 10), ("cifar100", 100), ("svhn", 10)]:
        _variant(f"resnext{_tag}_{_ds}", _blocks, _c, _w, _classes)
