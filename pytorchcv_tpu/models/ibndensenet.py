"""IBN-DenseNet, TPU-native. Behavioral reference: pytorchcv
``models/ibndensenet.py`` (IBNPreConvBlock:14, ibn_pre_conv1x1_block:84,
IBNDenseUnit:115, IBNDenseNet:170, get_ibndensenet:246)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import BatchNorm, IBN, Sequential, global_avg_pool2d, \
    pre_conv3x3_block
from ..nn.base import conv_kernel_init, dense_kernel_init
from .densenet import TransitionBlock, densenet_channels
from .preresnet import PreResActivation, PreResInitBlock
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["IBNDenseNet", "get_ibndensenet"]


class IBNPreConvBlock(nn.Module):
    """(IBN|BN) -> ReLU -> conv (reference ibndensenet.py:14)."""

    out_channels: int = 0
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    use_ibn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.use_ibn:
            x = IBN(channels=x.shape[-1], first_fraction=0.6,
                    inst_first=False, name="ibn")(x, train=train)
        else:
            x = BatchNorm(name="bn")(x, train=train)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (self.kernel_size,) * 2,
                    strides=(self.stride,) * 2,
                    padding=((self.padding,) * 2,) * 2, use_bias=False,
                    kernel_init=conv_kernel_init, name="conv")(x)
        return x


class IBNDenseUnit(nn.Module):
    """IBN dense unit (reference ibndensenet.py:115)."""

    out_channels: int = 0
    dropout_rate: float = 0.0
    conv1_ibn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        bn_size = 4
        inc_channels = self.out_channels - x.shape[-1]
        mid_channels = inc_channels * bn_size
        x = IBNPreConvBlock(out_channels=mid_channels,
                            use_ibn=self.conv1_ibn,
                            name="conv1")(x, train=train)
        x = pre_conv3x3_block(out_channels=inc_channels,
                              name="conv2")(x, train=train)
        if self.dropout_rate != 0.0:
            x = nn.Dropout(rate=self.dropout_rate,
                           deterministic=not train)(x)
        return jnp.concatenate([identity, x], axis=-1)


def IBNDenseNet(channels, init_block_channels: int,
                dropout_rate: float = 0.0, in_channels: int = 3,
                in_size: Tuple[int, int] = (224, 224),
                num_classes: int = 1000) -> ImageClassifier:
    """IBN-DenseNet (reference ibndensenet.py:170)."""
    layers = [PreResInitBlock(out_channels=init_block_channels,
                              name="init_block")]
    in_ch = init_block_channels
    for i, channels_per_stage in enumerate(channels):
        units = []
        if i != 0:
            units.append(TransitionBlock(out_channels=in_ch // 2,
                                         name=f"trans{i + 1}"))
            in_ch //= 2
        for j, out_channels in enumerate(channels_per_stage):
            conv1_ibn = (i < 3) and (j % 3 == 0)
            units.append(IBNDenseUnit(out_channels=out_channels,
                                      dropout_rate=dropout_rate,
                                      conv1_ibn=conv1_ibn,
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


def get_ibndensenet(num_layers: int, **kwargs):
    """Config expander (reference ibndensenet.py:246)."""
    table = {121: (64, 32, [6, 12, 24, 16]), 161: (96, 48, [6, 12, 36, 24]),
             169: (64, 32, [6, 12, 32, 32]), 201: (64, 32, [6, 12, 48, 32])}
    if num_layers not in table:
        raise ValueError(f"Unsupported IBN-DenseNet layers: {num_layers}")
    init_block_channels, growth_rate, layers = table[num_layers]
    channels = densenet_channels(init_block_channels, growth_rate, layers)
    return IBNDenseNet(channels=channels,
                       init_block_channels=init_block_channels, **kwargs)


@register_model("ibn_densenet121")
def ibn_densenet121(**kwargs):
    return get_ibndensenet(num_layers=121, **kwargs)


@register_model("ibn_densenet161")
def ibn_densenet161(**kwargs):
    return get_ibndensenet(num_layers=161, **kwargs)


@register_model("ibn_densenet169")
def ibn_densenet169(**kwargs):
    return get_ibndensenet(num_layers=169, **kwargs)


@register_model("ibn_densenet201")
def ibn_densenet201(**kwargs):
    return get_ibndensenet(num_layers=201, **kwargs)
