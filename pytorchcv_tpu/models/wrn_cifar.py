"""WRN for CIFAR/SVHN, TPU-native. Behavioral reference: pytorchcv
``models/wrn_cifar.py`` (CIFARWRN:15, get_wrn_cifar:70, 9 variants).
Pre-activation units over width-scaled channels."""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import Sequential, conv3x3, global_avg_pool2d
from ..nn.base import dense_kernel_init
from .preresnet import PreResActivation, PreResUnit
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["CIFARWRN", "get_wrn_cifar"]


def CIFARWRN(channels, init_block_channels: int, in_channels: int = 3,
             in_size: Tuple[int, int] = (32, 32),
             num_classes: int = 10) -> ImageClassifier:
    """CIFAR WRN (reference wrn_cifar.py:15)."""
    layers = [conv3x3(out_channels=init_block_channels, name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(PreResUnit(out_channels=out_channels, stride=stride,
                                    bottleneck=False, conv1_stride=False,
                                    name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(PreResActivation(name="post_activ"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_wrn_cifar(num_classes: int, blocks: int, width_factor: int,
                  **kwargs):
    """Config expander (reference wrn_cifar.py:70)."""
    assert num_classes in (10, 100)
    assert (blocks - 4) % 6 == 0
    layers = [(blocks - 4) // 6] * 3
    channels_per_layers = [16, 32, 64]
    channels = [[ci * width_factor] * li
                for ci, li in zip(channels_per_layers, layers)]
    return CIFARWRN(channels=channels, init_block_channels=16,
                    num_classes=num_classes, **kwargs)


def _variant(name, blocks, width_factor, classes):
    @register_model(name)
    def ctor(num_classes: int = classes, **kwargs):
        return get_wrn_cifar(num_classes=num_classes, blocks=blocks,
                             width_factor=width_factor, **kwargs)
    ctor.__name__ = name
    return ctor


for _blocks, _wf in [(16, 10), (28, 10), (40, 8)]:
    for _ds, _classes in [("cifar10", 10), ("cifar100", 100), ("svhn", 10)]:
        _variant(f"wrn{_blocks}_{_wf}_{_ds}", _blocks, _wf, _classes)
