"""RoR-3 (Residual-of-Residual) for CIFAR/SVHN, TPU-native. Behavioral
reference: pytorchcv ``models/ror_cifar.py`` (RoRBlock:15, RoRResUnit:53,
RoRResStage:86, RoRResBody:139, CIFARRoR:196, 9 variants). Three shortcut
levels: unit residual, stage shortcut, body shortcut (stride 4)."""

from __future__ import annotations

from typing import Sequence, Tuple

from flax import linen as nn

from ..nn import (Sequential, conv1x1_block, conv3x3_block,
                  global_avg_pool2d, max_pool2d)
from ..nn.base import dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["CIFARRoR", "get_ror_cifar"]


class RoRBlock(nn.Module):
    """two 3x3 conv blocks, second act-free (reference ror_cifar.py:15)."""

    out_channels: int = 0
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.out_channels, name="conv1")(
            x, train=train)
        if self.dropout_rate != 0.0 and train:
            x = nn.Dropout(rate=self.dropout_rate, deterministic=False,
                           name="dropout")(x)
        x = conv3x3_block(out_channels=self.out_channels, activation=None,
                          name="conv2")(x, train=train)
        return x


class RoRResUnit(nn.Module):
    """unit-level residual (reference ror_cifar.py:53)."""

    out_channels: int = 0
    dropout_rate: float = 0.0
    last_activate: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        resize_identity = (x.shape[-1] != self.out_channels)
        if resize_identity:
            identity = conv1x1_block(out_channels=self.out_channels,
                                     activation=None,
                                     name="identity_conv")(x, train=train)
        else:
            identity = x
        x = RoRBlock(out_channels=self.out_channels,
                     dropout_rate=self.dropout_rate, name="body")(
                         x, train=train)
        x = x + identity
        if self.last_activate:
            x = nn.relu(x)
        return x


class RoRResStage(nn.Module):
    """stage-level shortcut + optional end downsample
    (reference ror_cifar.py:86)."""

    out_channels_list: Sequence[int] = ()
    dropout_rate: float = 0.0
    downsample: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = conv1x1_block(out_channels=self.out_channels_list[-1],
                                 activation=None, name="shortcut")(
                                     x, train=train)
        units = [RoRResUnit(out_channels=oc, dropout_rate=self.dropout_rate,
                            last_activate=(i != len(self.out_channels_list)
                                           - 1),
                            name=f"unit{i + 1}", parent=None)
                 for i, oc in enumerate(self.out_channels_list)]
        x = Sequential(layers=tuple(units), name="units")(x, train=train)
        x = x + identity
        if self.downsample:
            x = nn.relu(x)
            x = max_pool2d(2, 2, 0)(x)
        return x


class RoRResBody(nn.Module):
    """body-level shortcut over all stages (reference ror_cifar.py:139)."""

    out_channels_lists: Sequence[Sequence[int]] = ()
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = conv1x1_block(
            out_channels=self.out_channels_lists[-1][-1], stride=4,
            activation=None, name="shortcut")(x, train=train)
        stages = [RoRResStage(
            out_channels_list=tuple(cps), dropout_rate=self.dropout_rate,
            downsample=(i != len(self.out_channels_lists) - 1),
            name=f"stage{i + 1}", parent=None)
            for i, cps in enumerate(self.out_channels_lists)]
        x = Sequential(layers=tuple(stages), name="stages")(x, train=train)
        return nn.relu(x + identity)


def CIFARRoR(channels, init_block_channels: int, dropout_rate: float = 0.0,
             in_channels: int = 3, in_size: Tuple[int, int] = (32, 32),
             num_classes: int = 10) -> ImageClassifier:
    """CIFAR RoR (reference ror_cifar.py:196)."""
    layers = [conv3x3_block(out_channels=init_block_channels,
                            name="init_block"),
              RoRResBody(out_channels_lists=tuple(tuple(c) for c in
                                                  channels),
                         dropout_rate=dropout_rate, name="body"),
              global_avg_pool2d()]
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_ror_cifar(num_classes: int, blocks: int, **kwargs):
    """Config expander (reference ror_cifar.py:~280)."""
    assert num_classes in (10, 100)
    assert (blocks - 8) % 6 == 0
    layers = [(blocks - 8) // 6] * 3
    channels_per_layers = [16, 32, 64]
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    return CIFARRoR(channels=channels, init_block_channels=16,
                    num_classes=num_classes, **kwargs)


def _variant(name, blocks, classes):
    @register_model(name)
    def ctor(num_classes: int = classes, **kwargs):
        return get_ror_cifar(num_classes=num_classes, blocks=blocks,
                             **kwargs)
    ctor.__name__ = name
    return ctor


for _blocks in (56, 110, 164):
    for _ds, _classes in [("cifar10", 10), ("cifar100", 100), ("svhn", 10)]:
        _variant(f"ror3_{_blocks}_{_ds}", _blocks, _classes)
