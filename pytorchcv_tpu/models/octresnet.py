"""Oct-ResNet for ImageNet-1K, TPU-native (JAX/flax, NHWC).

Behavioral reference: pytorchcv ``models/octresnet.py`` (OctConv:20,
OctConvBlock:193, OctResBlock:310, OctResBottleneck:360, OctResUnit:443,
OctResNet:521, get_octresnet:617) — octave convolution from 'Drop an
Octave' https://arxiv.org/abs/1904.05049.

TPU notes: the octave conv keeps the reference's SINGLE packed weight
tensor (HWIO here) and slices the four frequency quadrants at trace time —
XLA constant-folds the slices, so each quadrant is an independent MXU conv
and the checkpoint converter maps the packed tensor 1:1. Down/up sampling
between the high/low streams is avg-pool / nearest-repeat (cheap VPU ops
that fuse into the adjacent convs)."""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import (DualPathSequential, avg_pool2d, lambda_batchnorm2d,
                  lambda_relu)
from ..nn.activ import create_activation_layer
from ..nn.base import IntPair, conv_kernel_init, dense_kernel_init, to_2tuple
from ..nn.norm import create_normalization_layer
from .registry import register_model
from .resnet import ResInitBlock
from .shell import ImageClassifier

__all__ = ["OctResNet", "OctConv", "OctConvBlock", "OctResUnit",
           "get_octresnet"]


def _conv2d_raw(x, w, b, padding, dilation, groups):
    pad = to_2tuple(padding)
    dil = to_2tuple(dilation)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1),
        padding=[(pad[0], pad[0]), (pad[1], pad[1])],
        rhs_dilation=dil, feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + b
    return y


class OctConv(nn.Module):
    """Octave convolution (reference octresnet.py:20): one packed weight,
    four sliced quadrant convs over (high, low) frequency streams. Spatial
    stride is realised as a 2x2 avg-pool on the inputs (reference
    semantics)."""

    out_channels: int = 0
    kernel_size: IntPair = 3
    stride: IntPair = 1
    padding: IntPair = 1
    dilation: IntPair = 1
    groups: int = 1
    bias: bool = False
    oct_alpha: float = 0.0
    oct_mode: str = "std"
    oct_value: int = 2

    @nn.compact
    def __call__(self, hx, lx=None):
        stride = to_2tuple(self.stride)
        downsample = stride[0] > 1 or stride[1] > 1
        if self.oct_mode == "first":
            in_alpha, out_alpha = 0.0, self.oct_alpha
        elif self.oct_mode == "norm":
            in_alpha, out_alpha = self.oct_alpha, self.oct_alpha
        elif self.oct_mode == "last":
            in_alpha, out_alpha = self.oct_alpha, 0.0
        elif self.oct_mode == "std":
            in_alpha, out_alpha = 0.0, 0.0
        else:
            raise ValueError(
                f"Unsupported octave convolution mode: {self.oct_mode}")

        in_channels = hx.shape[-1] + (lx.shape[-1] if lx is not None else 0)
        h_in = int(in_channels * (1.0 - in_alpha))
        h_out = int(self.out_channels * (1.0 - out_alpha))
        ks = to_2tuple(self.kernel_size)
        kernel = self.param("kernel", conv_kernel_init,
                            (*ks, in_channels // self.groups,
                             self.out_channels))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.out_channels,)) if self.bias else None

        def conv(x, w, b):
            return _conv2d_raw(x, w, b, self.padding, self.dilation,
                               self.groups)

        pool = avg_pool2d(kernel_size=self.oct_value, stride=self.oct_value)

        if self.oct_mode == "std":
            return conv(hx, kernel, bias), None
        if downsample:
            hx = pool(hx)
        h_bias = bias[:h_out] if bias is not None else None
        l_bias = bias[h_out:] if bias is not None else None
        hhy = conv(hx, kernel[:, :, :h_in, :h_out], h_bias)
        if self.oct_mode != "first":
            hlx = conv(lx, kernel[:, :, h_in:, :h_out], h_bias)
        if self.oct_mode == "last":
            return hhy + hlx, None
        lhx = pool(hx)
        lhy = conv(lhx, kernel[:, :, :h_in, h_out:], l_bias)
        if self.oct_mode == "first":
            return hhy, lhy
        if downsample:
            hly = hlx
            llx = pool(lx)
        else:
            v = self.oct_value
            hly = jnp.repeat(jnp.repeat(hlx, v, axis=1), v, axis=2)
            llx = lx
        lly = conv(llx, kernel[:, :, h_in:, h_out:], l_bias)
        return hhy + hly, lhy + lly


class OctConvBlock(nn.Module):
    """OctConv + per-stream BN + activation (reference octresnet.py:193)."""

    out_channels: int = 0
    kernel_size: IntPair = 3
    stride: IntPair = 1
    padding: IntPair = 1
    dilation: IntPair = 1
    groups: int = 1
    bias: bool = False
    oct_alpha: float = 0.0
    oct_mode: str = "std"
    normalization: Any = lambda_batchnorm2d()
    activation: Any = lambda_relu()

    @nn.compact
    def __call__(self, hx, lx=None, train: bool = False):
        last = self.oct_mode in ("last", "std")
        hx, lx = OctConv(
            out_channels=self.out_channels, kernel_size=self.kernel_size,
            stride=self.stride, padding=self.padding, dilation=self.dilation,
            groups=self.groups, bias=self.bias, oct_alpha=self.oct_alpha,
            oct_mode=self.oct_mode, name="conv")(hx, lx)
        hx = create_normalization_layer(self.normalization, name="h_bn")(
            hx, train=train)
        activ = create_activation_layer(self.activation, name="activ")
        if activ is not None:
            hx = activ(hx)
        if not last:
            lx = create_normalization_layer(self.normalization, name="l_bn")(
                lx, train=train)
            if activ is not None:
                lx = activ(lx)
        return hx, lx


def oct_conv1x1_block(stride=1, padding=0, **kwargs) -> OctConvBlock:
    return OctConvBlock(kernel_size=1, stride=stride, padding=padding,
                        **kwargs)


def oct_conv3x3_block(stride=1, padding=1, **kwargs) -> OctConvBlock:
    return OctConvBlock(kernel_size=3, stride=stride, padding=padding,
                        **kwargs)


class OctResBlock(nn.Module):
    """Two 3x3 octave conv blocks (reference octresnet.py:310)."""

    out_channels: int = 0
    stride: IntPair = 1
    oct_alpha: float = 0.0
    oct_mode: str = "std"

    @nn.compact
    def __call__(self, hx, lx=None, train: bool = False):
        hx, lx = oct_conv3x3_block(
            out_channels=self.out_channels, stride=self.stride,
            oct_alpha=self.oct_alpha, oct_mode=self.oct_mode,
            name="conv1")(hx, lx, train=train)
        hx, lx = oct_conv3x3_block(
            out_channels=self.out_channels, oct_alpha=self.oct_alpha,
            oct_mode=("std" if self.oct_mode == "last" else
                      (self.oct_mode if self.oct_mode != "first"
                       else "norm")),
            activation=None, name="conv2")(hx, lx, train=train)
        return hx, lx


class OctResBottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 octave bottleneck (reference octresnet.py:360)."""

    out_channels: int = 0
    stride: IntPair = 1
    padding: IntPair = 1
    dilation: IntPair = 1
    oct_alpha: float = 0.0
    oct_mode: str = "std"
    conv1_stride: bool = False
    bottleneck_factor: int = 4

    @nn.compact
    def __call__(self, hx, lx=None, train: bool = False):
        mid_channels = self.out_channels // self.bottleneck_factor
        hx, lx = oct_conv1x1_block(
            out_channels=mid_channels,
            stride=(self.stride if self.conv1_stride else 1),
            oct_alpha=self.oct_alpha,
            oct_mode=(self.oct_mode if self.oct_mode != "last" else "norm"),
            name="conv1")(hx, lx, train=train)
        hx, lx = oct_conv3x3_block(
            out_channels=mid_channels,
            stride=(1 if self.conv1_stride else self.stride),
            padding=self.padding, dilation=self.dilation,
            oct_alpha=self.oct_alpha,
            oct_mode=(self.oct_mode if self.oct_mode != "first" else "norm"),
            name="conv2")(hx, lx, train=train)
        hx, lx = oct_conv1x1_block(
            out_channels=self.out_channels, oct_alpha=self.oct_alpha,
            oct_mode=("std" if self.oct_mode == "last" else
                      (self.oct_mode if self.oct_mode != "first"
                       else "norm")),
            activation=None, name="conv3")(hx, lx, train=train)
        return hx, lx


class OctResUnit(nn.Module):
    """Octave residual unit (reference octresnet.py:443)."""

    out_channels: int = 0
    stride: IntPair = 1
    padding: IntPair = 1
    dilation: IntPair = 1
    oct_alpha: float = 0.0
    oct_mode: str = "std"
    bottleneck: bool = True
    conv1_stride: bool = False

    @nn.compact
    def __call__(self, hx, lx=None, train: bool = False):
        in_channels = hx.shape[-1] + (lx.shape[-1] if lx is not None else 0)
        resize_identity = (in_channels != self.out_channels) or \
            (self.stride != 1) or \
            ((self.oct_mode == "first") and (self.oct_alpha != 0.0))
        if resize_identity:
            h_identity, l_identity = oct_conv1x1_block(
                out_channels=self.out_channels, stride=self.stride,
                oct_alpha=self.oct_alpha, oct_mode=self.oct_mode,
                activation=None, name="identity_conv")(hx, lx, train=train)
        else:
            h_identity, l_identity = hx, lx
        if self.bottleneck:
            hx, lx = OctResBottleneck(
                out_channels=self.out_channels, stride=self.stride,
                padding=self.padding, dilation=self.dilation,
                oct_alpha=self.oct_alpha, oct_mode=self.oct_mode,
                conv1_stride=self.conv1_stride, name="body")(
                    hx, lx, train=train)
        else:
            hx, lx = OctResBlock(
                out_channels=self.out_channels, stride=self.stride,
                oct_alpha=self.oct_alpha, oct_mode=self.oct_mode,
                name="body")(hx, lx, train=train)
        hx = nn.relu(hx + h_identity)
        if lx is not None:
            lx = nn.relu(lx + l_identity)
        return hx, lx


def OctResNet(channels, init_block_channels: int, bottleneck: bool,
              conv1_stride: bool, oct_alpha: float = 0.5,
              in_channels: int = 3, in_size: Tuple[int, int] = (224, 224),
              num_classes: int = 1000) -> ImageClassifier:
    """Oct-ResNet (reference octresnet.py:521)."""
    layers = [ResInitBlock(out_channels=init_block_channels,
                           name="init_block", parent=None)]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            if (i == 0) and (j == 0):
                oct_mode = "first"
            elif (i == len(channels) - 1) and (j == 0):
                oct_mode = "last"
            elif (i == len(channels) - 1) and (j != 0):
                oct_mode = "std"
            else:
                oct_mode = "norm"
            units.append(OctResUnit(
                out_channels=out_channels, stride=stride,
                oct_alpha=oct_alpha, oct_mode=oct_mode,
                bottleneck=bottleneck, conv1_stride=conv1_stride,
                name=f"unit{j + 1}", parent=None))
        layers.append(DualPathSequential(layers=tuple(units),
                                         name=f"stage{i + 1}", parent=None))
    layers.append(avg_pool2d(kernel_size=7, stride=1))
    features = DualPathSequential(layers=tuple(layers), return_two=False,
                                  first_ordinals=1, last_ordinals=1,
                                  name="features")
    return ImageClassifier(
        features=features,
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_octresnet(blocks: int, bottleneck: Optional[bool] = None,
                  conv1_stride: bool = True, oct_alpha: float = 0.5,
                  **kwargs):
    """Config expander (reference octresnet.py:617)."""
    if bottleneck is None:
        bottleneck = blocks >= 50
    layer_table = {(10, False): [1, 1, 1, 1], (50, True): [3, 4, 6, 3]}
    layers = layer_table[(blocks, bool(bottleneck))]
    init_block_channels = 64
    channels_per_layers = [64, 128, 256, 512]
    if bottleneck:
        channels_per_layers = [ci * 4 for ci in channels_per_layers]
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    return OctResNet(channels=channels,
                     init_block_channels=init_block_channels,
                     bottleneck=bottleneck, conv1_stride=conv1_stride,
                     oct_alpha=oct_alpha, **kwargs)


@register_model("octresnet10_ad2")
def octresnet10_ad2(**kwargs):
    return get_octresnet(blocks=10, oct_alpha=0.5, **kwargs)


@register_model("octresnet50b_ad2")
def octresnet50b_ad2(**kwargs):
    return get_octresnet(blocks=50, conv1_stride=False, oct_alpha=0.5,
                         **kwargs)
