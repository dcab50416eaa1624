"""ResNet for CIFAR/SVHN, TPU-native. Behavioral reference: pytorchcv
``models/resnet_cifar.py`` (CIFARResNet:21, get_resnet_cifar:92,
24 registered variants)."""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import Sequential, conv3x3_block, global_avg_pool2d
from ..nn.base import dense_kernel_init
from .registry import register_model
from .resnet import ResUnit
from .shell import ImageClassifier

__all__ = ["CIFARResNet", "get_resnet_cifar"]


def CIFARResNet(channels, init_block_channels: int, bottleneck: bool,
                in_channels: int = 3, in_size: Tuple[int, int] = (32, 32),
                num_classes: int = 10) -> ImageClassifier:
    """CIFAR ResNet (reference resnet_cifar.py:21): conv3x3 block stem,
    three stages, 8x8 global pool."""
    layers = [conv3x3_block(out_channels=init_block_channels,
                            name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(ResUnit(out_channels=out_channels, stride=stride,
                                 bottleneck=bottleneck, conv1_stride=False,
                                 name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_resnet_cifar(num_classes: int, blocks: int, bottleneck: bool,
                     **kwargs):
    """Config expander (reference resnet_cifar.py:92)."""
    assert num_classes in (10, 100)
    if bottleneck:
        assert (blocks - 2) % 9 == 0
        layers = [(blocks - 2) // 9] * 3
    else:
        assert (blocks - 2) % 6 == 0
        layers = [(blocks - 2) // 6] * 3
    channels_per_layers = [16, 32, 64]
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    if bottleneck:
        channels = [[cij * 4 for cij in ci] for ci in channels]
    return CIFARResNet(channels=channels, init_block_channels=16,
                       bottleneck=bottleneck, num_classes=num_classes,
                       **kwargs)


def _register_cifar_family(prefix, builder, block_specs,
                           datasets=(("cifar10", 10), ("cifar100", 100),
                                     ("svhn", 10))):
    """Register <prefix><blocks>[bn]_<dataset> constructor grid."""
    for blocks, bottleneck, tag in block_specs:
        for ds, classes in datasets:
            name = f"{prefix}{tag}_{ds}"

            def make(blocks=blocks, bottleneck=bottleneck, classes=classes):
                @register_model(name)
                def ctor(num_classes: int = classes, **kwargs):
                    return builder(num_classes=num_classes, blocks=blocks,
                                   bottleneck=bottleneck, **kwargs)
                return ctor

            make()


_SPECS = [(20, False, "20"), (56, False, "56"), (110, False, "110"),
          (164, True, "164bn"), (272, True, "272bn"), (542, True, "542bn"),
          (1001, True, "1001"), (1202, False, "1202")]

_register_cifar_family("resnet", get_resnet_cifar, _SPECS)
