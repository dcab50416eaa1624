"""CondenseNet, TPU-native. Behavioral reference: pytorchcv
``models/condensenet.py`` (CondenseSimpleConv:13, CondenseComplexConv:77,
CondenseUnit:151, TransitionBlock:190, CondenseInitBlock:211,
PostActivation:239, CondenseLinear:262, CondenseNet:300,
get_condensenet:382).

The learned-group-conv channel permutation is a gather on the (minor-most)
channel axis driven by an int32 ``index`` buffer loaded from the checkpoint
(``buffers`` collection)."""

from __future__ import annotations

from functools import reduce
from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import BatchNorm, ChannelShuffle, Sequential, avg_pool2d, \
    global_avg_pool2d
from ..nn.base import conv_kernel_init, dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["CondenseNet", "get_condensenet"]


class CondenseSimpleConv(nn.Module):
    """BN -> ReLU -> group conv (reference condensenet.py:13)."""

    out_channels: int = 0
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(name="bn")(x, train=train)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (self.kernel_size,) * 2,
                    strides=(self.stride,) * 2,
                    padding=((self.padding,) * 2,) * 2,
                    feature_group_count=self.groups, use_bias=False,
                    kernel_init=conv_kernel_init, name="conv")(x)
        return x


class CondenseComplexConv(nn.Module):
    """index-select -> BN -> ReLU -> group conv -> shuffle
    (reference condensenet.py:77)."""

    out_channels: int = 0
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        index = self.variable("buffers", "index",
                              lambda: jnp.zeros((x.shape[-1],), jnp.int32))
        x = jnp.take(x, index.value.astype(jnp.int32), axis=-1)
        x = BatchNorm(name="bn")(x, train=train)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (self.kernel_size,) * 2,
                    strides=(self.stride,) * 2,
                    padding=((self.padding,) * 2,) * 2,
                    feature_group_count=self.groups, use_bias=False,
                    kernel_init=conv_kernel_init, name="conv")(x)
        x = ChannelShuffle(groups=self.groups)(x)
        return x


class CondenseUnit(nn.Module):
    """Dense unit with learned group convs (reference condensenet.py:151)."""

    out_channels: int = 0
    groups: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        bottleneck_size = 4
        inc_channels = self.out_channels - x.shape[-1]
        mid_channels = inc_channels * bottleneck_size
        x = CondenseComplexConv(out_channels=mid_channels, kernel_size=1,
                                padding=0, groups=self.groups,
                                name="conv1")(x, train=train)
        x = CondenseSimpleConv(out_channels=inc_channels, kernel_size=3,
                               padding=1, groups=self.groups,
                               name="conv2")(x, train=train)
        return jnp.concatenate([identity, x], axis=-1)


class CondenseLinear(nn.Module):
    """index-select + fc head (reference condensenet.py:262)."""

    out_features: int = 1000
    drop_rate: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        drop_in = int(x.shape[-1] * self.drop_rate)
        index = self.variable("buffers", "index",
                              lambda: jnp.zeros((drop_in,), jnp.int32))
        x = jnp.take(x, index.value.astype(jnp.int32), axis=-1)
        return nn.Dense(self.out_features, kernel_init=dense_kernel_init,
                        name="linear")(x)


def CondenseNet(channels, init_block_channels: int, groups: int,
                in_channels: int = 3, in_size: Tuple[int, int] = (224, 224),
                num_classes: int = 1000) -> ImageClassifier:
    """CondenseNet (reference condensenet.py:300)."""
    layers = [_CondenseInitBlock(out_channels=init_block_channels,
                                 name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        if i != 0:
            units.append(avg_pool2d(2, 2))
        for j, out_channels in enumerate(channels_per_stage):
            units.append(CondenseUnit(out_channels=out_channels,
                                      groups=groups, name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(_PostActivation(name="post_activ"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=CondenseLinear(out_features=num_classes, name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


class _PostActivation(nn.Module):
    """BN + ReLU final block (reference condensenet.py:239)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(name="bn")(x, train=train)
        return nn.relu(x)


class _CondenseInitBlock(nn.Module):
    """Plain strided 3x3 conv stem (reference condensenet.py:211)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)), use_bias=False,
                       kernel_init=conv_kernel_init, name="conv")(x)


def get_condensenet(num_layers: int, groups: int = 4, **kwargs):
    """Config expander (reference condensenet.py:382)."""
    if num_layers != 74:
        raise ValueError(f"Unsupported CondenseNet layers: {num_layers}")
    init_block_channels = 16
    layers = [4, 6, 8, 10, 8]
    growth_rates = [8, 16, 32, 64, 128]
    channels = reduce(
        lambda xi, yi: xi + [reduce(lambda xj, yj: xj + [xj[-1] + yj],
                                    [yi[1]] * yi[0], [xi[-1][-1]])[1:]],
        zip(layers, growth_rates), [[init_block_channels]])[1:]
    return CondenseNet(channels=channels,
                       init_block_channels=init_block_channels,
                       groups=groups, **kwargs)


@register_model("condensenet74_c4_g4")
def condensenet74_c4_g4(**kwargs):
    return get_condensenet(num_layers=74, groups=4, **kwargs)


@register_model("condensenet74_c8_g8")
def condensenet74_c8_g8(**kwargs):
    return get_condensenet(num_layers=74, groups=8, **kwargs)
