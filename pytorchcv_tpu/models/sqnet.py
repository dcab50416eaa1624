"""SQNet, TPU-native. Behavioral reference: pytorchcv ``models/sqnet.py``
(FireBlock:16, ParallelDilatedConv:79, SQNetUpStage:125, SQNet:186,
get_sqnet:300). ELU activations, no BN."""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import (Concurrent, Hourglass, Sequential, conv1x1_block,
                  conv3x3_block, deconv3x3_block, max_pool2d)
from ..nn.base import Composed
from .registry import register_model

__all__ = ["SQNet", "get_sqnet"]

_elu = jax.nn.elu


class FireBlock(nn.Module):
    """Squeeze + dual expand (reference sqnet.py:16)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        squeeze_channels = self.out_channels // 8
        expand_channels = self.out_channels // 2
        x = conv1x1_block(out_channels=squeeze_channels, bias=True,
                          normalization=None, activation=_elu,
                          name="conv")(x, train=train)
        x = Concurrent(layers=(
            conv1x1_block(out_channels=expand_channels, bias=True,
                          normalization=None, activation=None,
                          name="branch1", parent=None),
            conv3x3_block(out_channels=expand_channels, bias=True,
                          normalization=None, activation=None,
                          name="branch2", parent=None),
        ), name="branches")(x, train=train)
        return _elu(x)


class ParallelDilatedConv(nn.Module):
    """Summed parallel dilated convs (reference sqnet.py:79)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        branches = tuple(
            conv3x3_block(out_channels=self.out_channels, padding=d,
                          dilation=d, bias=True, normalization=None,
                          activation=_elu, name=f"branch{i + 1}",
                          parent=None)
            for i, d in enumerate([1, 2, 3, 4]))
        return Concurrent(layers=branches, merge_type="sum",
                          name="branches")(x, train=train)


class SQNetUpStage(nn.Module):
    """conv (or parallel dilated) + deconv (reference sqnet.py:125)."""

    out_channels: int = 0
    use_parallel_conv: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        if self.use_parallel_conv:
            x = ParallelDilatedConv(out_channels=in_channels,
                                    name="conv")(x, train=train)
        else:
            x = conv3x3_block(out_channels=in_channels, bias=True,
                              normalization=None, activation=_elu,
                              name="conv")(x, train=train)
        return deconv3x3_block(out_channels=self.out_channels, stride=2,
                               bias=True, normalization=None,
                               activation=_elu, name="deconv")(x, train=train)


class SQNetDownStage(nn.Module):
    """pool + fire blocks (reference sqnet.py:237-252)."""

    out_channels: int = 0
    num_layers: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = max_pool2d(2, 2)(x)
        for j in range(self.num_layers):
            x = FireBlock(out_channels=self.out_channels,
                          name=f"unit{j + 2}")(x, train=train)
        return x


class SQNet(Composed):
    """SQNet (reference sqnet.py:186)."""

    channels: Any = None
    init_block_channels: int = 96
    layers: Any = None
    aux: bool = False
    fixed_size: bool = False
    in_size: Tuple[int, int] = (1024, 2048)
    in_channels: int = 3
    num_classes: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.init_block_channels, stride=2,
                          bias=True, normalization=None, activation=_elu,
                          name="stem")(x, train=train)
        in_channels = self.init_block_channels
        down_seq, skip_seq = [], []
        for i, out_channels in enumerate(self.channels[0]):
            skip_seq.append(conv3x3_block(
                out_channels=in_channels, bias=True, normalization=None,
                activation=_elu, name=f"skip{i + 1}", parent=None))
            down_seq.append(SQNetDownStage(
                out_channels=out_channels, num_layers=self.layers[i],
                name=f"down{i + 1}", parent=None))
            in_channels = out_channels
        in_channels //= 2
        up_seq = []
        for i, out_channels in enumerate(self.channels[1]):
            up_seq.append(SQNetUpStage(
                out_channels=out_channels, use_parallel_conv=(i == 0),
                name=f"up{i + 1}", parent=None))
            in_channels = out_channels
        up_seq = up_seq[::-1]
        x = Hourglass(down_seq=tuple(down_seq), up_seq=tuple(up_seq),
                      skip_seq=tuple(skip_seq), merge_type="cat",
                      name="hg")(x, train=train)
        return SQNetUpStage(out_channels=self.num_classes,
                            use_parallel_conv=False,
                            name="head")(x, train=train)


def get_sqnet(**kwargs):
    """Config expander (reference sqnet.py:300)."""
    channels = [[128, 256, 512], [256, 128, 96]]
    return SQNet(channels=channels, init_block_channels=96,
                 layers=[2, 2, 3], **kwargs)


@register_model("sqnet_cityscapes")
def sqnet_cityscapes(num_classes: int = 19, **kwargs):
    return get_sqnet(num_classes=num_classes, **kwargs)
