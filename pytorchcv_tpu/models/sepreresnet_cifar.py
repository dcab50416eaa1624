"""SE-PreResNet for CIFAR/SVHN, TPU-native. Behavioral reference: pytorchcv
``models/sepreresnet_cifar.py`` (CIFARSEPreResNet:21, 24 variants)."""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import Sequential, conv3x3_block, global_avg_pool2d
from ..nn.base import dense_kernel_init
from .registry import register_model
from .resnet_cifar import _SPECS, _register_cifar_family
from .sepreresnet import SEPreResUnit
from .shell import ImageClassifier

__all__ = ["CIFARSEPreResNet", "get_sepreresnet_cifar"]


def CIFARSEPreResNet(channels, init_block_channels: int, bottleneck: bool,
                     in_channels: int = 3,
                     in_size: Tuple[int, int] = (32, 32),
                     num_classes: int = 10) -> ImageClassifier:
    """CIFAR SE-PreResNet (reference sepreresnet_cifar.py:21)."""
    layers = [conv3x3_block(out_channels=init_block_channels,
                            name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(SEPreResUnit(out_channels=out_channels,
                                      stride=stride, bottleneck=bottleneck,
                                      conv1_stride=False,
                                      name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    # NOTE: unlike preresnet_cifar, the reference has no post-activation here
    # (sepreresnet_cifar.py state_dict has no post_activ keys).
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_sepreresnet_cifar(num_classes: int, blocks: int, bottleneck: bool,
                          **kwargs):
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
    return CIFARSEPreResNet(channels=channels, init_block_channels=16,
                            bottleneck=bottleneck, num_classes=num_classes,
                            **kwargs)


_register_cifar_family("sepreresnet", get_sepreresnet_cifar, _SPECS)
