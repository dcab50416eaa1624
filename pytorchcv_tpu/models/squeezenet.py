"""SqueezeNet, TPU-native. Behavioral reference: pytorchcv
``models/squeezenet.py`` (FireConv:15, FireUnit:34, SqueezeInitBlock:88,
SqueezeNet:119, get_squeezenet:~230). Conv-head classifier: 1x1 conv +
relu + global pool.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import Sequential, global_avg_pool2d, max_pool2d
from ..nn.conv import _conv2d
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["SqueezeNet", "FireUnit", "get_squeezenet"]


class FireConv(nn.Module):
    """biased conv + relu (reference squeezenet.py:15)."""

    out_channels: int = 0
    kernel_size: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv2d(self.out_channels, self.kernel_size, 1, self.padding,
                    bias=True, name="conv")(x)
        return nn.relu(x)


class FireUnit(nn.Module):
    """squeeze 1x1 -> (expand1x1 | expand3x3) concat
    (reference squeezenet.py:34)."""

    squeeze_channels: int = 0
    expand1x1_channels: int = 0
    expand3x3_channels: int = 0
    residual: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        x = FireConv(out_channels=self.squeeze_channels, kernel_size=1,
                     name="squeeze")(x)
        y1 = FireConv(out_channels=self.expand1x1_channels, kernel_size=1,
                      name="expand1x1")(x)
        y2 = FireConv(out_channels=self.expand3x3_channels, kernel_size=3,
                      padding=1, name="expand3x3")(x)
        out = jnp.concatenate([y1, y2], axis=-1)
        if self.residual:
            out = out + identity
        return out


class SqueezeInitBlock(nn.Module):
    """biased conv stride 2 + relu (reference squeezenet.py:88)."""

    out_channels: int = 0
    kernel_size: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv2d(self.out_channels, self.kernel_size, 2, 0, bias=True,
                    name="conv")(x)
        return nn.relu(x)


class SqueezeOutput(nn.Module):
    """final_conv + relu + global pool (reference squeezenet.py:192-200)."""

    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv2d(self.num_classes, 1, bias=True, name="final_conv")(x)
        x = nn.relu(x)
        return jnp.mean(x, axis=(1, 2), keepdims=True)


class SqueezeDropout(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        if train:
            x = nn.Dropout(rate=0.5, deterministic=False,
                           name="dropout")(x)
        return x


def SqueezeNet(channels, residuals, init_block_kernel_size: int,
               init_block_channels: int, in_channels: int = 3,
               in_size: Tuple[int, int] = (224, 224),
               num_classes: int = 1000) -> ImageClassifier:
    """SqueezeNet (reference squeezenet.py:119)."""
    layers = [SqueezeInitBlock(out_channels=init_block_channels,
                               kernel_size=init_block_kernel_size,
                               name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = [max_pool2d(3, 2, 0, ceil_mode=True)]
        for j, out_channels in enumerate(channels_per_stage):
            expand_channels = out_channels // 2
            squeeze_channels = out_channels // 8
            units.append(FireUnit(
                squeeze_channels=squeeze_channels,
                expand1x1_channels=expand_channels,
                expand3x3_channels=expand_channels,
                residual=(residuals is not None and residuals[i][j] == 1),
                name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(SqueezeDropout(name="do"))
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=SqueezeOutput(num_classes=num_classes, name="output"),
        output_before_flatten=True,
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_squeezenet(version: str, residual: bool = False, **kwargs):
    """Config expander (reference squeezenet.py:~230)."""
    if version == "1.0":
        channels = [[128, 128, 256], [256, 384, 384, 512], [512]]
        residuals = [[0, 1, 0], [1, 0, 1, 0], [1]]
        init_block_kernel_size = 7
        init_block_channels = 96
    elif version == "1.1":
        channels = [[128, 128], [256, 256], [384, 384, 512, 512]]
        residuals = [[0, 1], [0, 1], [0, 1, 0, 1]]
        init_block_kernel_size = 3
        init_block_channels = 64
    else:
        raise ValueError(f"Unsupported SqueezeNet version {version}")
    if not residual:
        residuals = None
    return SqueezeNet(channels=channels, residuals=residuals,
                      init_block_kernel_size=init_block_kernel_size,
                      init_block_channels=init_block_channels, **kwargs)


def _variant(name, version, residual):
    @register_model(name)
    def ctor(**kwargs):
        return get_squeezenet(version=version, residual=residual, **kwargs)
    ctor.__name__ = name
    return ctor


squeezenet_v1_0 = _variant("squeezenet_v1_0", "1.0", False)
squeezenet_v1_1 = _variant("squeezenet_v1_1", "1.1", False)
squeezeresnet_v1_0 = _variant("squeezeresnet_v1_0", "1.0", True)
squeezeresnet_v1_1 = _variant("squeezeresnet_v1_1", "1.1", True)
