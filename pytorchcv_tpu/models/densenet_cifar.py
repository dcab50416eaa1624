"""DenseNet for CIFAR/SVHN, TPU-native. Behavioral reference: pytorchcv
``models/densenet_cifar.py`` (DenseSimpleUnit:24, CIFARDenseNet:61,
get_densenet_cifar:139, 27 variants)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import Sequential, conv3x3, global_avg_pool2d, pre_conv3x3_block
from ..nn.base import dense_kernel_init
from .densenet import DenseUnit, TransitionBlock
from .preresnet import PreResActivation
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["CIFARDenseNet", "get_densenet_cifar"]


class DenseSimpleUnit(nn.Module):
    """single pre-act 3x3 + concat (reference densenet_cifar.py:24)."""

    out_channels: int = 0
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        inc_channels = self.out_channels - x.shape[-1]
        identity = x
        x = pre_conv3x3_block(out_channels=inc_channels, name="conv")(
            x, train=train)
        if self.dropout_rate != 0.0 and train:
            x = nn.Dropout(rate=self.dropout_rate, deterministic=False,
                           name="dropout")(x)
        return jnp.concatenate([identity, x], axis=-1)


def CIFARDenseNet(channels, init_block_channels: int, bottleneck: bool,
                  dropout_rate: float = 0.0, in_channels: int = 3,
                  in_size: Tuple[int, int] = (32, 32),
                  num_classes: int = 10) -> ImageClassifier:
    """CIFAR DenseNet (reference densenet_cifar.py:61)."""
    unit_class = DenseUnit if bottleneck else DenseSimpleUnit
    layers = [conv3x3(out_channels=init_block_channels, name="init_block")]
    in_ch = init_block_channels
    for i, channels_per_stage in enumerate(channels):
        units = []
        if i != 0:
            units.append(TransitionBlock(out_channels=in_ch // 2,
                                         name=f"trans{i + 1}"))
            in_ch = in_ch // 2
        for j, out_channels in enumerate(channels_per_stage):
            units.append(unit_class(out_channels=out_channels,
                                    dropout_rate=dropout_rate,
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


def get_densenet_cifar(num_classes: int, blocks: int, growth_rate: int,
                       bottleneck: bool, **kwargs):
    """Config expander (reference densenet_cifar.py:139)."""
    assert num_classes in (10, 100)
    if bottleneck:
        assert (blocks - 4) % 6 == 0
        layers = [(blocks - 4) // 6] * 3
    else:
        assert (blocks - 4) % 3 == 0
        layers = [(blocks - 4) // 3] * 3
    init_block_channels = 2 * growth_rate

    channels = []
    last = init_block_channels * 2
    for li in layers:
        base = last // 2
        stage = []
        c = base
        for _ in range(li):
            c += growth_rate
            stage.append(c)
        channels.append(stage)
        last = stage[-1]

    return CIFARDenseNet(channels=channels,
                         init_block_channels=init_block_channels,
                         bottleneck=bottleneck, num_classes=num_classes,
                         **kwargs)


def _variant(name, blocks, growth_rate, bottleneck, classes):
    @register_model(name)
    def ctor(num_classes: int = classes, **kwargs):
        return get_densenet_cifar(num_classes=num_classes, blocks=blocks,
                                  growth_rate=growth_rate,
                                  bottleneck=bottleneck, **kwargs)
    ctor.__name__ = name
    return ctor


for _blocks, _k, _bc, _tag in [
        (40, 12, False, "40_k12"), (40, 12, True, "40_k12_bc"),
        (40, 24, True, "40_k24_bc"), (40, 36, True, "40_k36_bc"),
        (100, 12, False, "100_k12"), (100, 24, False, "100_k24"),
        (100, 12, True, "100_k12_bc"), (190, 40, True, "190_k40_bc"),
        (250, 24, True, "250_k24_bc")]:
    for _ds, _classes in [("cifar10", 10), ("cifar100", 100), ("svhn", 10)]:
        _variant(f"densenet{_tag}_{_ds}", _blocks, _k, _bc, _classes)
