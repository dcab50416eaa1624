"""DenseNet, TPU-native. Behavioral reference: pytorchcv
``models/densenet.py`` (DenseUnit:15, TransitionBlock:56, DenseNet:87,
get_densenet:160). Dense connectivity is running channel concat — cheap
layout ops under XLA; compute stays in the pre-activation conv blocks.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (Sequential, avg_pool2d, global_avg_pool2d,
                  pre_conv1x1_block, pre_conv3x3_block)
from ..nn.base import dense_kernel_init
from .preresnet import PreResActivation, PreResInitBlock
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["DenseNet", "DenseUnit", "TransitionBlock", "get_densenet"]


class DenseUnit(nn.Module):
    """pre-act 1x1 (4x growth) -> pre-act 3x3 (growth) -> concat
    (reference densenet.py:15)."""

    out_channels: int = 0
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn_size = 4
        inc_channels = self.out_channels - x.shape[-1]
        mid_channels = inc_channels * bn_size
        identity = x
        x = pre_conv1x1_block(out_channels=mid_channels, name="conv1")(
            x, train=train)
        x = pre_conv3x3_block(out_channels=inc_channels, name="conv2")(
            x, train=train)
        if self.dropout_rate != 0.0 and train:
            x = nn.Dropout(rate=self.dropout_rate, deterministic=False,
                           name="dropout")(x)
        return jnp.concatenate([identity, x], axis=-1)


class TransitionBlock(nn.Module):
    """pre-act 1x1 halving + 2x2 avgpool (reference densenet.py:56)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = pre_conv1x1_block(out_channels=self.out_channels, name="conv")(
            x, train=train)
        return avg_pool2d(2, 2, 0)(x)


def DenseNet(channels, init_block_channels: int, dropout_rate: float = 0.0,
             in_channels: int = 3, in_size: Tuple[int, int] = (224, 224),
             num_classes: int = 1000) -> ImageClassifier:
    """DenseNet (reference densenet.py:87)."""
    layers = [PreResInitBlock(out_channels=init_block_channels,
                              name="init_block")]
    in_ch = init_block_channels
    for i, channels_per_stage in enumerate(channels):
        units = []
        if i != 0:
            units.append(TransitionBlock(out_channels=in_ch // 2,
                                         name=f"trans{i + 1}"))
            in_ch = in_ch // 2
        for j, out_channels in enumerate(channels_per_stage):
            units.append(DenseUnit(out_channels=out_channels,
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


def densenet_channels(init_block_channels: int, growth_rate: int, layers):
    """Per-unit output channel plan (reference densenet.py:205-212)."""
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
    return channels


def get_densenet(blocks: int, **kwargs):
    """Config expander (reference densenet.py:160)."""
    table = {121: (64, 32, [6, 12, 24, 16]),
             161: (96, 48, [6, 12, 36, 24]),
             169: (64, 32, [6, 12, 32, 32]),
             201: (64, 32, [6, 12, 48, 32])}
    if blocks not in table:
        raise ValueError(f"Unsupported DenseNet blocks: {blocks}")
    init_block_channels, growth_rate, layers = table[blocks]
    channels = densenet_channels(init_block_channels, growth_rate, layers)
    return DenseNet(channels=channels,
                    init_block_channels=init_block_channels, **kwargs)


def _variant(name, blocks):
    @register_model(name)
    def ctor(**kwargs):
        return get_densenet(blocks=blocks, **kwargs)
    ctor.__name__ = name
    return ctor


densenet121 = _variant("densenet121", 121)
densenet161 = _variant("densenet161", 161)
densenet169 = _variant("densenet169", 169)
densenet201 = _variant("densenet201", 201)
