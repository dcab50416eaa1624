"""DarkNet ref/tiny/19, TPU-native. Behavioral reference: pytorchcv
``models/darknet.py`` (dark_convYxY:16, DarkNet:46, get_darknet:~140).
Leaky-ReLU conv stacks with a conv-head classifier.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import (Sequential, conv1x1_block, conv3x3_block,
                  lambda_leakyrelu, max_pool2d)
from ..nn.conv import _conv2d
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["DarkNet", "get_darknet"]


def dark_convYxY(out_channels: int, activation, pointwise: bool, name: str):
    """1x1 or 3x3 conv block (reference darknet.py:16)."""
    if pointwise:
        return conv1x1_block(out_channels=out_channels,
                             activation=activation, name=name)
    return conv3x3_block(out_channels=out_channels, activation=activation,
                         name=name)


class DarkOutput(nn.Module):
    """final_conv + optional leaky activ + global pool
    (reference darknet.py:99-107)."""

    num_classes: int = 1000
    cls_activ: bool = True
    alpha: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv2d(self.num_classes, 1, bias=True, name="final_conv")(x)
        if self.cls_activ:
            x = jax.nn.leaky_relu(x, self.alpha)
        return jnp.mean(x, axis=(1, 2), keepdims=True)


def DarkNet(channels, odd_pointwise: bool, avg_pool_size: int,
            cls_activ: bool, alpha: float = 0.1, in_channels: int = 3,
            in_size: Tuple[int, int] = (224, 224),
            num_classes: int = 1000) -> ImageClassifier:
    """DarkNet (reference darknet.py:46)."""
    activation = lambda_leakyrelu(negative_slope=alpha)
    stages = []
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            pointwise = (len(channels_per_stage) > 1) and not (
                ((j + 1) % 2 == 1) ^ odd_pointwise)
            units.append(dark_convYxY(out_channels, activation, pointwise,
                                      name=f"unit{j + 1}"))
        if i != len(channels) - 1:
            units.append(max_pool2d(2, 2))
        stages.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    return ImageClassifier(
        features=Sequential(layers=tuple(stages), name="features"),
        output=DarkOutput(num_classes=num_classes, cls_activ=cls_activ,
                          alpha=alpha, name="output"),
        output_before_flatten=True,
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_darknet(version: str, **kwargs):
    """Config expander (reference darknet.py:~140)."""
    if version == "ref":
        channels = [[16], [32], [64], [128], [256], [512], [1024]]
        odd_pointwise = False
        avg_pool_size = 3
        cls_activ = True
    elif version == "tiny":
        channels = [[16], [32], [16, 128, 16, 128], [32, 256, 32, 256],
                    [64, 512, 64, 512, 128]]
        odd_pointwise = True
        avg_pool_size = 14
        cls_activ = False
    elif version == "19":
        channels = [[32], [64], [128, 64, 128], [256, 128, 256],
                    [512, 256, 512, 256, 512],
                    [1024, 512, 1024, 512, 1024]]
        odd_pointwise = False
        avg_pool_size = 7
        cls_activ = False
    else:
        raise ValueError(f"Unsupported DarkNet version {version}")
    return DarkNet(channels=channels, odd_pointwise=odd_pointwise,
                   avg_pool_size=avg_pool_size, cls_activ=cls_activ,
                   **kwargs)


@register_model("darknet_ref")
def darknet_ref(**kwargs):
    return get_darknet(version="ref", **kwargs)


@register_model("darknet_tiny")
def darknet_tiny(**kwargs):
    return get_darknet(version="tiny", **kwargs)


@register_model("darknet19")
def darknet19(**kwargs):
    return get_darknet(version="19", **kwargs)
