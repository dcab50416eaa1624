"""AlexNet, TPU-native. Behavioral reference: pytorchcv
``models/alexnet.py`` (AlexConv:16, AlexDense:43, AlexOutputBlock:71,
AlexNet:105, get_alexnet:197). LRN on the first two stages for version 'a'.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import Sequential, max_pool2d
from ..nn.base import dense_kernel_init
from ..nn.conv import _conv2d
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["AlexNet", "get_alexnet", "local_response_norm"]


def local_response_norm(x, size: int = 5, alpha: float = 1e-4,
                        beta: float = 0.75, k: float = 2.0):
    """torch F.local_response_norm over the channel (last) axis, NHWC."""
    sq = x * x
    half = size // 2
    c = x.shape[-1]
    padded = jnp.pad(sq, ((0, 0), (0, 0), (0, 0), (half, size - 1 - half)))
    # windowed channel sum via cumulative sum difference
    csum = jnp.cumsum(padded, axis=-1)
    csum = jnp.pad(csum, ((0, 0), (0, 0), (0, 0), (1, 0)))
    window = csum[..., size:size + c] - csum[..., 0:c]
    return x / (k + alpha / size * window) ** beta


class AlexConv(nn.Module):
    """Biased conv + ReLU + optional LRN (reference alexnet.py:16)."""

    out_channels: int = 0
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_lrn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv2d(self.out_channels, self.kernel_size, self.stride,
                    self.padding, bias=True, name="conv")(x)
        x = nn.relu(x)
        if self.use_lrn:
            x = local_response_norm(x, size=5, k=2.0)
        return x


class AlexDense(nn.Module):
    """fc + relu + dropout(0.5) (reference alexnet.py:43)."""

    out_features: int = 4096

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.out_features, kernel_init=dense_kernel_init,
                     name="fc")(x)
        x = nn.relu(x)
        if train:
            x = nn.Dropout(rate=0.5, deterministic=False,
                           name="dropout")(x)
        return x


class AlexOutputBlock(nn.Module):
    """fc1 -> fc2 -> fc3 (reference alexnet.py:71)."""

    classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = AlexDense(name="fc1")(x, train=train)
        x = AlexDense(name="fc2")(x, train=train)
        return nn.Dense(self.classes, kernel_init=dense_kernel_init,
                        name="fc3")(x)


def AlexNet(channels, kernel_sizes, strides, paddings, use_lrn: bool,
            in_channels: int = 3, in_size: Tuple[int, int] = (224, 224),
            num_classes: int = 1000) -> ImageClassifier:
    """AlexNet (reference alexnet.py:105)."""
    stages = []
    for i, channels_per_stage in enumerate(channels):
        use_lrn_i = use_lrn and (i in (0, 1))
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            units.append(AlexConv(
                out_channels=out_channels,
                kernel_size=kernel_sizes[i][j], stride=strides[i][j],
                padding=paddings[i][j], use_lrn=use_lrn_i,
                name=f"unit{j + 1}"))
        units.append(max_pool2d(3, 2, 0, ceil_mode=True))
        stages.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    return ImageClassifier(
        features=Sequential(layers=tuple(stages), name="features"),
        output=AlexOutputBlock(classes=num_classes, name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_alexnet(version: str = "a", **kwargs):
    """Config expander (reference alexnet.py:197)."""
    if version == "a":
        channels = [[96], [256], [384, 384, 256]]
        kernel_sizes = [[11], [5], [3, 3, 3]]
        strides = [[4], [1], [1, 1, 1]]
        paddings = [[0], [2], [1, 1, 1]]
        use_lrn = True
    elif version == "b":
        channels = [[64], [192], [384, 256, 256]]
        kernel_sizes = [[11], [5], [3, 3, 3]]
        strides = [[4], [1], [1, 1, 1]]
        paddings = [[2], [2], [1, 1, 1]]
        use_lrn = False
    else:
        raise ValueError(f"Unsupported AlexNet version {version}")
    return AlexNet(channels=channels, kernel_sizes=kernel_sizes,
                   strides=strides, paddings=paddings, use_lrn=use_lrn,
                   **kwargs)


@register_model("alexnet")
def alexnet(**kwargs):
    return get_alexnet(version="a", **kwargs)


@register_model("alexnetb")
def alexnetb(**kwargs):
    return get_alexnet(version="b", **kwargs)
