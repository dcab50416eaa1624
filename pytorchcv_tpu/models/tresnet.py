"""TResNet for ImageNet-1K, TPU-native (JAX/flax, NHWC).

Behavioral reference: pytorchcv ``models/tresnet.py``
(anti_aliased_downsample:17, TResBlock:45, TResBottleneck:100,
ResADownBlock:180, TResUnit:217, space_to_depth:282, TResInitBlock:306,
TResNet:346, get_tresnet:451) from 'TResNet: High Performance
GPU-Dedicated Architecture' https://arxiv.org/abs/2003.13630.

TPU notes: the anti-aliased blur-pool is a fixed depthwise 3x3 [1 2 1]^2/16
kernel — emitted as a constant-weight grouped conv that XLA folds; space-
to-depth is a reshape/transpose (layout-only)."""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn import (SEBlock, Sequential, avg_pool2d, conv1x1_block,
                  conv3x3_block, lambda_leakyrelu)
from ..nn.base import IntPair, dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["TResNet", "get_tresnet"]


def anti_aliased_downsample(x: jnp.ndarray) -> jnp.ndarray:
    """Blur-pool: reflect-pad + fixed [1,2,1]^T[1,2,1]/16 depthwise conv,
    stride 2 (reference tresnet.py:17)."""
    channels = x.shape[-1]
    w = np.array([1.0, 2.0, 1.0], np.float32)
    w = np.outer(w, w)
    w = (w / w.sum())[:, :, None, None]
    w = jnp.asarray(np.tile(w, (1, 1, 1, channels)), x.dtype)
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding="VALID",
        feature_group_count=channels,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def space_to_depth(x: jnp.ndarray, k: int = 4) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/k, W/k, k*k*C) with the reference's channel
    order (kh, kw, c) (reference tresnet.py:282)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // k, k, w // k, k, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // k, w // k, k * k * c)


class TResBlock(nn.Module):
    """Two 3x3 blocks + blur-pool + SE (reference tresnet.py:45)."""

    out_channels: int = 0
    stride: IntPair = 1
    activation: Any = lambda_leakyrelu()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.out_channels,
                          activation=self.activation, name="conv1")(
                              x, train=train)
        if self.stride > 1:
            x = anti_aliased_downsample(x)
        x = conv3x3_block(out_channels=self.out_channels,
                          activation=self.activation, name="conv2")(
                              x, train=train)
        return SEBlock(mid_channels=max(self.out_channels // 4, 64),
                       name="se")(x, train=train)


class TResBottleneck(nn.Module):
    """1x1 -> 3x3 -> (pool) -> (SE) -> 1x1 (reference tresnet.py:100)."""

    out_channels: int = 0
    stride: IntPair = 1
    use_se: bool = True
    activation: Any = lambda_leakyrelu()
    bottleneck_factor: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = self.out_channels // self.bottleneck_factor
        x = conv1x1_block(out_channels=mid_channels,
                          activation=self.activation, name="conv1")(
                              x, train=train)
        x = conv3x3_block(out_channels=mid_channels,
                          activation=self.activation, name="conv2")(
                              x, train=train)
        if self.stride > 1:
            x = avg_pool2d(kernel_size=3, stride=self.stride, padding=1)(x)
        if self.use_se:
            x = SEBlock(mid_channels=max(
                mid_channels * self.bottleneck_factor // 8, 64),
                name="se")(x, train=train)
        return conv1x1_block(out_channels=self.out_channels,
                             activation=self.activation, name="conv3")(
                                 x, train=train)


class ResADownBlock(nn.Module):
    """avg-pool (ceil, exclude-pad) + 1x1 block (reference
    tresnet.py:180)."""

    out_channels: int = 0
    stride: IntPair = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = avg_pool2d(kernel_size=self.stride, stride=self.stride,
                       ceil_mode=True, count_include_pad=False)(x)
        return conv1x1_block(out_channels=self.out_channels,
                             activation=None, name="conv")(x, train=train)


class TResUnit(nn.Module):
    """TResNet residual unit (reference tresnet.py:217)."""

    out_channels: int = 0
    stride: IntPair = 1
    use_se: bool = True
    bottleneck: bool = True
    activation: Any = lambda_leakyrelu()

    @nn.compact
    def __call__(self, x, train: bool = False):
        resize_identity = (x.shape[-1] != self.out_channels) or \
            (self.stride != 1)
        if resize_identity:
            identity = ResADownBlock(out_channels=self.out_channels,
                                     stride=self.stride,
                                     name="identity_block")(x, train=train)
        else:
            identity = x
        if self.bottleneck:
            x = TResBottleneck(out_channels=self.out_channels,
                               stride=self.stride, use_se=self.use_se,
                               activation=self.activation, name="body")(
                                   x, train=train)
        else:
            x = TResBlock(out_channels=self.out_channels,
                          stride=self.stride, activation=self.activation,
                          name="body")(x, train=train)
        return nn.relu(x + identity)


class TResInitBlock(nn.Module):
    """space-to-depth + blur-pool + 3x3 block (reference tresnet.py:306)."""

    out_channels: int = 0
    activation: Any = lambda_leakyrelu()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = space_to_depth(x)
        x = anti_aliased_downsample(x)
        return conv3x3_block(out_channels=self.out_channels,
                             activation=self.activation, name="conv")(
                                 x, train=train)


def TResNet(channels, init_block_channels: int, bottleneck,
            in_channels: int = 3, in_size: Tuple[int, int] = (224, 224),
            num_classes: int = 1000) -> ImageClassifier:
    """TResNet (reference tresnet.py:346)."""
    activation = lambda_leakyrelu()
    layers = [TResInitBlock(out_channels=init_block_channels,
                            activation=activation, name="init_block",
                            parent=None)]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(TResUnit(
                out_channels=out_channels, stride=stride,
                use_se=(i != len(channels) - 1), bottleneck=bottleneck[i],
                activation=activation, name=f"unit{j + 1}", parent=None))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}",
                                 parent=None))
    layers.append(lambda x: jnp.mean(x, axis=(1, 2), keepdims=True))
    features = Sequential(layers=tuple(layers), name="features")
    output = Sequential(layers=(
        nn.Dense(num_classes, kernel_init=dense_kernel_init, name="fc",
                 parent=None),
    ), name="output", parent=None)
    return ImageClassifier(features=features, output=output,
                           in_size=in_size, in_channels=in_channels,
                           num_classes=num_classes)


def get_tresnet(version: str, **kwargs):
    """Config expander (reference tresnet.py:451)."""
    if version == "m":
        layers, width_scale = [3, 4, 11, 3], 1.0
    elif version == "l":
        layers, width_scale = [4, 5, 18, 3], 1.2
    elif version == "xl":
        layers, width_scale = [4, 5, 24, 3], 1.3
    else:
        raise ValueError(f"Unsupported TResNet version {version}")
    init_block_channels = 64
    channels_per_layers = [64, 128, 256, 512]
    if width_scale != 1.0:
        init_block_channels = int(init_block_channels * width_scale)
        channels_per_layers = [init_block_channels * (2 ** i)
                               for i in range(len(channels_per_layers))]
    bottleneck = [False, False, True, True]
    channels_per_layers = [ci * 4 if bi else ci
                           for ci, bi in zip(channels_per_layers,
                                             bottleneck)]
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    return TResNet(channels=channels,
                   init_block_channels=init_block_channels,
                   bottleneck=bottleneck, **kwargs)


@register_model("tresnet_m")
def tresnet_m(**kwargs):
    return get_tresnet(version="m", **kwargs)


@register_model("tresnet_l")
def tresnet_l(**kwargs):
    return get_tresnet(version="l", **kwargs)


@register_model("tresnet_xl")
def tresnet_xl(**kwargs):
    return get_tresnet(version="xl", **kwargs)
