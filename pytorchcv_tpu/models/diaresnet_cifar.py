"""DIA-ResNet for CIFAR/SVHN, TPU-native. Behavioral reference: pytorchcv
``models/diaresnet_cifar.py`` (CIFARDIAResNet:21, get_diaresnet_cifar:93,
18 variants)."""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import Sequential, conv3x3_block, global_avg_pool2d
from ..nn.base import dense_kernel_init
from .diaresnet import DIAResUnit, DIAStage
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["CIFARDIAResNet", "get_diaresnet_cifar"]


def CIFARDIAResNet(channels, init_block_channels: int, bottleneck: bool,
                   in_channels: int = 3, in_size: Tuple[int, int] = (32, 32),
                   num_classes: int = 10) -> ImageClassifier:
    """CIFAR DIA-ResNet (reference diaresnet_cifar.py:21)."""
    layers = [conv3x3_block(out_channels=init_block_channels,
                            name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(DIAResUnit(out_channels=out_channels, stride=stride,
                                    bottleneck=bottleneck,
                                    conv1_stride=False,
                                    name=f"unit{j + 1}", parent=None))
        layers.append(DIAStage(units=tuple(units),
                               attention_channels=channels_per_stage[0],
                               name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_diaresnet_cifar(num_classes: int, blocks: int, bottleneck: bool,
                        **kwargs):
    """Config expander (reference diaresnet_cifar.py:93)."""
    assert num_classes in (10, 100)
    if bottleneck:
        assert (blocks - 2) % 9 == 0
        layers = [(blocks - 2) // 9] * 3
    else:
        assert (blocks - 2) % 6 == 0
        layers = [(blocks - 2) // 6] * 3
    channels_per_layers = [16, 32, 64]
    init_block_channels = 16
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    if bottleneck:
        channels = [[cij * 4 for cij in ci] for ci in channels]
    return CIFARDIAResNet(channels=channels,
                          init_block_channels=init_block_channels,
                          bottleneck=bottleneck, num_classes=num_classes,
                          **kwargs)


for _blocks, _bn, _tag in [(20, False, "20"), (56, False, "56"),
                           (110, False, "110"), (164, True, "164bn"),
                           (1001, True, "1001"), (1202, False, "1202")]:
    for _ds, _classes in [("cifar10", 10), ("cifar100", 100), ("svhn", 10)]:
        _name = f"diaresnet{_tag}_{_ds}"

        def _make(blocks=_blocks, bn=_bn, classes=_classes):
            def ctor(num_classes: int = classes, **kwargs):
                return get_diaresnet_cifar(num_classes=num_classes,
                                           blocks=blocks, bottleneck=bn,
                                           **kwargs)
            return ctor
        _ctor = _make()
        _ctor.__name__ = _name
        register_model(_name)(_ctor)
