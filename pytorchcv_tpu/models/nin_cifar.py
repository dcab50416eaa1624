"""NIN for CIFAR/SVHN, TPU-native. Behavioral reference: pytorchcv
``models/nin_cifar.py`` (NINConv:15, CIFARNIN:38, get_nin_cifar:128)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import Sequential, avg_pool2d, max_pool2d
from ..nn.conv import _conv2d
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["CIFARNIN", "get_nin_cifar"]


class NINConv(nn.Module):
    """biased conv + relu (reference nin_cifar.py:15)."""

    out_channels: int = 0
    kernel_size: int = 1
    padding: int = 0
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv2d(self.out_channels, self.kernel_size, self.stride,
                    self.padding, bias=True, name="conv")(x)
        return nn.relu(x)


class NINDropout(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        if train:
            x = nn.Dropout(rate=0.5, deterministic=False,
                           name="dropout")(x)
        return x


class NINOutput(nn.Module):
    """final 1x1 NINConv + global pool (reference nin_cifar.py:104-110)."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = NINConv(out_channels=self.num_classes, kernel_size=1,
                    name="final_conv")(x)
        return jnp.mean(x, axis=(1, 2), keepdims=True)


def CIFARNIN(channels, first_kernel_sizes, in_channels: int = 3,
             in_size: Tuple[int, int] = (32, 32),
             num_classes: int = 10) -> ImageClassifier:
    """CIFAR NIN (reference nin_cifar.py:38)."""
    stages = []
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            if (j == 0) and (i != 0):
                if i == 1:
                    units.append(max_pool2d(3, 2, 1))
                else:
                    units.append(avg_pool2d(3, 2, 1))
                units.append(NINDropout(name=f"dropout{i + 1}"))
            kernel_size = first_kernel_sizes[i] if j == 0 else 1
            padding = (kernel_size - 1) // 2
            units.append(NINConv(out_channels=out_channels,
                                 kernel_size=kernel_size, padding=padding,
                                 name=f"unit{j + 1}"))
        stages.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    return ImageClassifier(
        features=Sequential(layers=tuple(stages), name="features"),
        output=NINOutput(num_classes=num_classes, name="output"),
        output_before_flatten=True,
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_nin_cifar(num_classes: int, **kwargs):
    """Config expander (reference nin_cifar.py:128)."""
    assert num_classes in (10, 100)
    channels = [[192, 160, 96], [192, 192, 192], [192, 192]]
    first_kernel_sizes = [5, 5, 3]
    return CIFARNIN(channels=channels,
                    first_kernel_sizes=first_kernel_sizes,
                    num_classes=num_classes, **kwargs)


def _variant(name, classes):
    @register_model(name)
    def ctor(num_classes: int = classes, **kwargs):
        return get_nin_cifar(num_classes=num_classes, **kwargs)
    ctor.__name__ = name
    return ctor


nin_cifar10 = _variant("nin_cifar10", 10)
nin_cifar100 = _variant("nin_cifar100", 100)
nin_svhn = _variant("nin_svhn", 10)
