"""SparseNet, TPU-native. Behavioral reference: pytorchcv
``models/sparsenet.py`` (sparsenet_exponential_fetch:14, SparseBlock:31,
SparseStage:80, SparseNet:138, get_sparsenet:211)."""

from __future__ import annotations

import math
from functools import reduce
from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (Sequential, global_avg_pool2d, pre_conv1x1_block,
                  pre_conv3x3_block)
from ..nn.base import dense_kernel_init
from .densenet import TransitionBlock
from .preresnet import PreResActivation, PreResInitBlock
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["SparseNet", "get_sparsenet"]


def sparsenet_exponential_fetch(lst):
    """Exponential index fetch (reference sparsenet.py:14)."""
    return [lst[len(lst) - 2 ** i]
            for i in range(1 + math.floor(math.log(len(lst), 2)))]


class SparseBlock(nn.Module):
    """Pre-activated 1x1 + 3x3 (reference sparsenet.py:31)."""

    out_channels: int = 0
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn_size = 4
        x = pre_conv1x1_block(out_channels=self.out_channels * bn_size,
                              name="conv1")(x, train=train)
        x = pre_conv3x3_block(out_channels=self.out_channels,
                              name="conv2")(x, train=train)
        if self.dropout_rate != 0.0:
            x = nn.Dropout(rate=self.dropout_rate,
                           deterministic=not train)(x)
        return x


class SparseBlocks(nn.Module):
    """The stage's block stack + exponential aggregation loop
    (reference sparsenet.py:107-130)."""

    num_blocks: int = 0
    growth_rate: int = 32
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = [x]
        for i in range(self.num_blocks):
            y = SparseBlock(out_channels=self.growth_rate,
                            dropout_rate=self.dropout_rate,
                            name=f"block{i + 1}")(x, train=train)
            outs.append(y)
            flt_outs = sparsenet_exponential_fetch(outs)
            x = jnp.concatenate(flt_outs, axis=-1)
        return x


class SparseStage(nn.Module):
    """Stage with exponentially sparse aggregation
    (reference sparsenet.py:80)."""

    channels_per_stage: Tuple = ()
    growth_rate: int = 32
    dropout_rate: float = 0.0
    do_transition: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.do_transition:
            x = TransitionBlock(out_channels=x.shape[-1] // 2,
                                name="trans")(x, train=train)
        return SparseBlocks(num_blocks=len(self.channels_per_stage),
                            growth_rate=self.growth_rate,
                            dropout_rate=self.dropout_rate,
                            name="blocks")(x, train=train)


def SparseNet(channels, init_block_channels: int, growth_rate: int,
              dropout_rate: float = 0.0, in_channels: int = 3,
              in_size: Tuple[int, int] = (224, 224),
              num_classes: int = 1000) -> ImageClassifier:
    """SparseNet (reference sparsenet.py:138)."""
    layers = [PreResInitBlock(out_channels=init_block_channels,
                              name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        layers.append(SparseStage(
            channels_per_stage=tuple(channels_per_stage),
            growth_rate=growth_rate, dropout_rate=dropout_rate,
            do_transition=(i != 0), name=f"stage{i + 1}"))
    layers.append(PreResActivation(name="post_activ"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_sparsenet(num_layers: int, **kwargs):
    """Config expander (reference sparsenet.py:211)."""
    table = {121: (64, 32, [6, 12, 24, 16]), 161: (96, 48, [6, 12, 36, 24]),
             169: (64, 32, [6, 12, 32, 32]), 201: (64, 32, [6, 12, 48, 32]),
             264: (64, 32, [6, 12, 64, 48])}
    if num_layers not in table:
        raise ValueError(f"Unsupported SparseNet layers: {num_layers}")
    init_block_channels, growth_rate, layers = table[num_layers]
    channels = reduce(
        lambda xi, yi: xi + [reduce(
            lambda xj, yj: xj + [sum(sparsenet_exponential_fetch(
                [xj[0]] + [yj[0]] * (yj[1] + 1)))],
            zip([growth_rate] * yi, range(yi)),
            [xi[-1][-1] // 2])[1:]],
        layers, [[init_block_channels * 2]])[1:]
    return SparseNet(channels=channels,
                     init_block_channels=init_block_channels,
                     growth_rate=growth_rate, **kwargs)


for _nl in (121, 161, 169, 201, 264):
    _name = f"sparsenet{_nl}"

    def _make(num_layers=_nl):
        def ctor(**kwargs):
            return get_sparsenet(num_layers=num_layers, **kwargs)
        return ctor
    _ctor = _make()
    _ctor.__name__ = _name
    register_model(_name)(_ctor)
