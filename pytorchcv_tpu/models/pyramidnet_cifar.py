"""PyramidNet for CIFAR/SVHN, TPU-native. Behavioral reference: pytorchcv
``models/pyramidnet_cifar.py`` (CIFARPyramidNet:21, get_pyramidnet_cifar:96,
21 variants)."""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import Sequential, conv3x3_block, global_avg_pool2d
from ..nn.base import dense_kernel_init
from .preresnet import PreResActivation
from .pyramidnet import PyrUnit, pyramidnet_channels
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["CIFARPyramidNet", "get_pyramidnet_cifar"]


def CIFARPyramidNet(channels, init_block_channels: int, bottleneck: bool,
                    in_channels: int = 3,
                    in_size: Tuple[int, int] = (32, 32),
                    num_classes: int = 10) -> ImageClassifier:
    """CIFAR PyramidNet (reference pyramidnet_cifar.py:21)."""
    layers = [conv3x3_block(out_channels=init_block_channels,
                            activation=None, name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 1 if (i == 0) or (j != 0) else 2
            units.append(PyrUnit(out_channels=out_channels, stride=stride,
                                 bottleneck=bottleneck,
                                 name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(PreResActivation(name="post_activ"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_pyramidnet_cifar(num_classes: int, blocks: int, alpha: int,
                         bottleneck: bool, **kwargs):
    """Config expander (reference pyramidnet_cifar.py:96)."""
    assert num_classes in (10, 100)
    if bottleneck:
        assert (blocks - 2) % 9 == 0
        layers = [(blocks - 2) // 9] * 3
    else:
        assert (blocks - 2) % 6 == 0
        layers = [(blocks - 2) // 6] * 3
    channels = pyramidnet_channels(16, alpha, layers, bottleneck)
    return CIFARPyramidNet(channels=channels, init_block_channels=16,
                           bottleneck=bottleneck, num_classes=num_classes,
                           **kwargs)


def _variant(name, blocks, alpha, bottleneck, classes):
    @register_model(name)
    def ctor(num_classes: int = classes, **kwargs):
        return get_pyramidnet_cifar(num_classes=num_classes, blocks=blocks,
                                    alpha=alpha, bottleneck=bottleneck,
                                    **kwargs)
    ctor.__name__ = name
    return ctor


for _blocks, _alpha, _bn, _tag in [
        (110, 48, False, "110_a48"), (110, 84, False, "110_a84"),
        (110, 270, False, "110_a270"), (164, 270, True, "164_a270_bn"),
        (200, 240, True, "200_a240_bn"), (236, 220, True, "236_a220_bn"),
        (272, 200, True, "272_a200_bn")]:
    for _ds, _classes in [("cifar10", 10), ("cifar100", 100), ("svhn", 10)]:
        _variant(f"pyramidnet{_tag}_{_ds}", _blocks, _alpha, _bn, _classes)
