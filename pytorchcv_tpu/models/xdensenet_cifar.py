"""X-DenseNet for CIFAR/SVHN, TPU-native. Behavioral reference: pytorchcv
``models/xdensenet_cifar.py`` (XDenseSimpleUnit:21, CIFARXDenseNet:76,
get_xdensenet_cifar:160, 6 variants)."""

from __future__ import annotations

from functools import reduce
from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import Sequential, conv3x3, global_avg_pool2d
from ..nn.base import dense_kernel_init
from .densenet import TransitionBlock
from .preresnet import PreResActivation
from .registry import register_model
from .shell import ImageClassifier
from .xdensenet import XDenseUnit, pre_xconv3x3_block

__all__ = ["CIFARXDenseNet", "get_xdensenet_cifar"]


class XDenseSimpleUnit(nn.Module):
    """Simple (non-bottleneck) X-DenseNet unit
    (reference xdensenet_cifar.py:21)."""

    out_channels: int = 0
    dropout_rate: float = 0.0
    expand_ratio: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        inc_channels = self.out_channels - x.shape[-1]
        x = pre_xconv3x3_block(out_channels=inc_channels,
                               expand_ratio=self.expand_ratio,
                               name="conv").clone(parent=self)(
            x, train=train)
        if self.dropout_rate != 0.0:
            x = nn.Dropout(rate=self.dropout_rate,
                           deterministic=not train)(x)
        return jnp.concatenate([identity, x], axis=-1)


def CIFARXDenseNet(channels, init_block_channels: int, bottleneck: bool,
                   dropout_rate: float = 0.0, expand_ratio: int = 2,
                   in_channels: int = 3, in_size: Tuple[int, int] = (32, 32),
                   num_classes: int = 10) -> ImageClassifier:
    """CIFAR X-DenseNet (reference xdensenet_cifar.py:76)."""
    unit_class = XDenseUnit if bottleneck else XDenseSimpleUnit
    layers = [conv3x3(out_channels=init_block_channels, name="init_block")]
    in_ch = init_block_channels
    for i, channels_per_stage in enumerate(channels):
        units = []
        if i != 0:
            units.append(TransitionBlock(out_channels=in_ch // 2,
                                         name=f"trans{i + 1}"))
            in_ch //= 2
        for j, out_channels in enumerate(channels_per_stage):
            units.append(unit_class(out_channels=out_channels,
                                    dropout_rate=dropout_rate,
                                    expand_ratio=expand_ratio,
                                    name=f"unit{j + 1}"))
            in_ch = out_channels
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(PreResActivation(name="post_activ"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_xdensenet_cifar(num_classes: int, blocks: int, growth_rate: int,
                        bottleneck: bool, expand_ratio: int = 2, **kwargs):
    """Config expander (reference xdensenet_cifar.py:160)."""
    assert num_classes in (10, 100)
    if bottleneck:
        assert (blocks - 4) % 6 == 0
        layers = [(blocks - 4) // 6] * 3
    else:
        assert (blocks - 4) % 3 == 0
        layers = [(blocks - 4) // 3] * 3
    init_block_channels = 2 * growth_rate
    channels = reduce(
        lambda xi, yi: xi + [reduce(lambda xj, yj: xj + [xj[-1] + yj],
                                    [growth_rate] * yi,
                                    [xi[-1][-1] // 2])[1:]],
        layers, [[init_block_channels * 2]])[1:]
    return CIFARXDenseNet(channels=channels,
                          init_block_channels=init_block_channels,
                          bottleneck=bottleneck, expand_ratio=expand_ratio,
                          num_classes=num_classes, **kwargs)


for _gr in (24, 36):
    for _ds, _classes in [("cifar10", 10), ("cifar100", 100), ("svhn", 10)]:
        _name = f"xdensenet40_2_k{_gr}_bc_{_ds}"

        def _make(growth_rate=_gr, classes=_classes):
            def ctor(num_classes: int = classes, **kwargs):
                return get_xdensenet_cifar(num_classes=num_classes,
                                           blocks=40,
                                           growth_rate=growth_rate,
                                           bottleneck=True, **kwargs)
            return ctor
        _ctor = _make()
        _ctor.__name__ = _name
        register_model(_name)(_ctor)
