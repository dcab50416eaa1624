"""SelecSLS, TPU-native. Behavioral reference: pytorchcv
``models/selecsls.py`` (SelecSLSBlock:13, SelecSLSUnit:45, SelecSLS:107,
get_selecsls:190)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (DualPathSequential, Sequential, conv1x1_block,
                  conv3x3_block, global_avg_pool2d)
from ..nn.base import dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["SelecSLS", "get_selecsls"]


class SelecSLSBlock(nn.Module):
    """1x1 expand + 3x3 block (reference selecsls.py:13)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv1x1_block(out_channels=2 * self.out_channels,
                          name="conv1")(x, train=train)
        return conv3x3_block(out_channels=self.out_channels,
                             name="conv2")(x, train=train)


class SelecSLSUnit(nn.Module):
    """Selective-skip unit (reference selecsls.py:45). Takes and returns
    (x, x0) dual-path streams."""

    out_channels: int = 0
    skip_channels: int = 0
    mid_channels: int = 0
    stride: int = 1

    @nn.compact
    def __call__(self, x, x0, train: bool = False):
        resize = (self.stride == 2)
        mid2 = self.mid_channels // 2
        x1 = conv3x3_block(out_channels=self.mid_channels,
                           stride=self.stride,
                           name="branch1")(x, train=train)
        x2 = SelecSLSBlock(out_channels=mid2, name="branch2")(x1, train=train)
        x3 = SelecSLSBlock(out_channels=mid2, name="branch3")(x2, train=train)
        if resize:
            y = jnp.concatenate([x1, x2, x3], axis=-1)
            y = conv1x1_block(out_channels=self.out_channels,
                              name="last_conv")(y, train=train)
            return y, y
        y = jnp.concatenate([x1, x2, x3, x0], axis=-1)
        y = conv1x1_block(out_channels=self.out_channels,
                          name="last_conv")(y, train=train)
        return y, x0


def SelecSLS(channels, skip_channels, mid_channels, kernels3,
             in_channels: int = 3, in_size: Tuple[int, int] = (224, 224),
             num_classes: int = 1000) -> ImageClassifier:
    """SelecSLS (reference selecsls.py:107)."""
    init_block_channels = 32
    layers = [conv3x3_block(out_channels=init_block_channels, stride=2,
                            name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        k = i - len(skip_channels)
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if j == 0 else 1
            if k < 0:
                units.append(SelecSLSUnit(
                    out_channels=out_channels,
                    skip_channels=skip_channels[i][j],
                    mid_channels=mid_channels[i][j], stride=stride,
                    name=f"unit{j + 1}", parent=None))
            else:
                blk = conv3x3_block if kernels3[k][j] == 1 else conv1x1_block
                units.append(blk(out_channels=out_channels, stride=stride,
                                 name=f"unit{j + 1}", parent=None))
        if k < 0:
            layers.append(DualPathSequential(layers=tuple(units),
                                             name=f"stage{i + 1}"))
        else:
            layers.append(Sequential(layers=tuple(units),
                                     name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    features = DualPathSequential(
        layers=tuple(layers), return_two=False, first_ordinals=1,
        last_ordinals=(1 + len(kernels3)), name="features")
    return ImageClassifier(
        features=features,
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_selecsls(version: str, **kwargs):
    """Config expander (reference selecsls.py:190)."""
    if version in ("42", "42b"):
        channels = [[64, 128], [144, 288], [304, 480]]
        skip_channels = [[0, 64], [0, 144], [0, 304]]
        mid_channels = [[64, 64], [144, 144], [304, 304]]
        kernels3 = [[1, 1], [1, 0]]
        head_channels = [[960, 1024], [1024, 1280]] if version == "42" \
            else [[960, 1024], [1280, 1024]]
    elif version in ("60", "60b"):
        channels = [[64, 128], [128, 128, 288], [288, 288, 288, 416]]
        skip_channels = [[0, 64], [0, 128, 128], [0, 288, 288, 288]]
        mid_channels = [[64, 64], [128, 128, 128], [288, 288, 288, 288]]
        kernels3 = [[1, 1], [1, 0]]
        head_channels = [[756, 1024], [1024, 1280]] if version == "60" \
            else [[756, 1024], [1280, 1024]]
    elif version == "84":
        channels = [[64, 144], [144, 144, 144, 144, 304],
                    [304, 304, 304, 304, 304, 512]]
        skip_channels = [[0, 64], [0, 144, 144, 144, 144],
                         [0, 304, 304, 304, 304, 304]]
        mid_channels = [[64, 64], [144, 144, 144, 144, 144],
                        [304, 304, 304, 304, 304, 304]]
        kernels3 = [[1, 1], [1, 1]]
        head_channels = [[960, 1024], [1024, 1280]]
    else:
        raise ValueError(f"Unsupported SelecSLS version {version}")
    channels = channels + head_channels
    return SelecSLS(channels=channels, skip_channels=skip_channels,
                    mid_channels=mid_channels, kernels3=kernels3, **kwargs)


for _v in ("42", "42b", "60", "60b", "84"):
    _name = f"selecsls{_v}"

    def _make(version=_v):
        def ctor(**kwargs):
            return get_selecsls(version=version, **kwargs)
        return ctor
    _ctor = _make()
    _ctor.__name__ = _name
    register_model(_name)(_ctor)
