"""DiracNetV2, TPU-native. Behavioral reference: pytorchcv
``models/diracnetv2.py`` (DiracConv:10, DiracInitBlock:60, DiracNetV2:92,
get_diracnetv2:170). Skip-free: plain pre-activated biased convs."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import Sequential, avg_pool2d, max_pool2d
from ..nn.base import conv_kernel_init, dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["DiracNetV2", "get_diracnetv2"]


class DiracConv(nn.Module):
    """ReLU -> biased conv (reference diracnetv2.py:10)."""

    out_channels: int = 0
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (self.kernel_size,) * 2,
                    strides=(self.stride,) * 2,
                    padding=((self.padding,) * 2,) * 2, use_bias=True,
                    kernel_init=conv_kernel_init, name="conv")(x)
        return x


class DiracInitBlock(nn.Module):
    """Biased 7x7 stride-2 conv + max pool (reference diracnetv2.py:60)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_channels, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=True,
                    kernel_init=conv_kernel_init, name="conv")(x)
        x = max_pool2d(3, 2, padding=1)(x)
        return x


def DiracNetV2(channels, init_block_channels: int, in_channels: int = 3,
               in_size: Tuple[int, int] = (224, 224),
               num_classes: int = 1000) -> ImageClassifier:
    """DiracNetV2 (reference diracnetv2.py:92)."""
    layers = [DiracInitBlock(out_channels=init_block_channels,
                             name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = [DiracConv(out_channels=oc, name=f"unit{j + 1}")
                 for j, oc in enumerate(channels_per_stage)]
        if i != len(channels) - 1:
            units.append(max_pool2d(2, 2))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(nn.relu)
    layers.append(avg_pool2d(7, 1))
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_diracnetv2(blocks: int, **kwargs):
    """Config expander (reference diracnetv2.py:170)."""
    if blocks == 18:
        layers = [4, 4, 4, 4]
    elif blocks == 34:
        layers = [6, 8, 12, 6]
    else:
        raise ValueError(f"Unsupported DiracNetV2 blocks: {blocks}")
    channels = [[ci] * li for ci, li in zip([64, 128, 256, 512], layers)]
    return DiracNetV2(channels=channels, init_block_channels=64, **kwargs)


@register_model("diracnet18v2")
def diracnet18v2(**kwargs):
    return get_diracnetv2(blocks=18, **kwargs)


@register_model("diracnet34v2")
def diracnet34v2(**kwargs):
    return get_diracnetv2(blocks=34, **kwargs)
