"""Attention block vocabulary (TPU-native analog of reference ``common/att.py``).

The SE gate is a pooled two-matmul bottleneck — tiny FLOPs, HBM-bound; it is
expressed with global means + 1x1 convs and left to XLA to fuse with the
surrounding blocks.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .activ import create_activation_layer, lambda_relu, lambda_sigmoid
from .base import dense_kernel_init
from .conv import ConvBlock, conv1x1, conv1x1_block, conv3x3_block
from .norm import lambda_batchnorm2d

__all__ = ["round_channels", "SEBlock", "SABlock", "SAConvBlock",
           "saconv3x3_block"]


def round_channels(channels, divisor: int = 8) -> int:
    """Divisible-by-``divisor`` channel rounding (reference att.py:15)."""
    rounded_channels = max(
        int(channels + divisor / 2.0) // divisor * divisor, divisor)
    if float(rounded_channels) < 0.9 * channels:
        rounded_channels += divisor
    return rounded_channels


class SEBlock(nn.Module):
    """Squeeze-and-Excitation gate (reference att.py:38).

    global-avg-pool -> 1x1 down -> act -> 1x1 up -> sigmoid -> scale.
    ``use_conv`` switches between 1x1-conv and dense parameterizations
    (both exist in the zoo's checkpoints).
    """

    channels: int = 0
    reduction: int = 16
    mid_channels: Optional[int] = None
    round_mid: bool = False
    use_conv: bool = True
    mid_activation: Any = lambda_relu()
    out_activation: Any = lambda_sigmoid()

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        channels = x.shape[-1]
        if self.mid_channels is not None:
            mid_channels = self.mid_channels
        elif self.round_mid:
            mid_channels = round_channels(float(channels) / self.reduction)
        else:
            mid_channels = channels // self.reduction

        w = jnp.mean(x, axis=(1, 2), keepdims=True)
        if self.use_conv:
            w = conv1x1(out_channels=mid_channels, bias=True, name="conv1")(w)
        else:
            w = w.reshape(w.shape[0], -1)
            w = nn.Dense(mid_channels, kernel_init=dense_kernel_init,
                         name="fc1")(w)
        w = create_activation_layer(self.mid_activation, name="activ")(w)
        if self.use_conv:
            w = conv1x1(out_channels=channels, bias=True, name="conv2")(w)
        else:
            w = nn.Dense(channels, kernel_init=dense_kernel_init, name="fc2")(w)
        w = create_activation_layer(self.out_activation, name="sigmoid")(w)
        if not self.use_conv:
            w = w[:, None, None, :]
        return x * w


class SABlock(nn.Module):
    """Split-Attention block (ResNeSt; reference att.py:108).

    Input is the grouped conv output with ``radix`` splits stacked on the
    channel axis: (B, H, W, radix*channels). Produces the radix-softmax
    weighted sum over splits.
    """

    out_channels: int = 0
    groups: int = 1
    radix: int = 2
    reduction: int = 4
    min_channels: int = 32
    use_conv: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w_, c = x.shape
        channels = self.out_channels
        radix = self.radix
        mid_channels = max(channels * radix // self.reduction,
                           self.min_channels)

        # (B, H, W, radix, C) — torch splits channel-major; NHWC keeps radix
        # adjacent to channels so the reshape below matches torch's
        # view(B, radix, C, H, W) split order.
        x_split = x.reshape(b, h, w_, radix, channels)
        u = jnp.sum(x_split, axis=3)                       # (B, H, W, C)
        s = jnp.mean(u, axis=(1, 2), keepdims=True)        # (B, 1, 1, C)
        if self.use_conv:
            s = conv1x1(out_channels=mid_channels, bias=True, name="conv1")(s)
        else:
            s = nn.Dense(mid_channels, kernel_init=dense_kernel_init,
                         name="fc1")(s.reshape(b, -1))
        from .norm import BatchNorm
        s = BatchNorm(name="bn")(s, train=train)
        s = nn.relu(s)
        if self.use_conv:
            s = conv1x1(out_channels=channels * radix, bias=True,
                        name="conv2")(s)
        else:
            s = nn.Dense(channels * radix, kernel_init=dense_kernel_init,
                         name="fc2")(s)
        s = s.reshape(b, 1, 1, radix, channels)
        s = jax.nn.softmax(s, axis=3)
        out = jnp.sum(x_split * s, axis=3)
        return out


class SAConvBlock(nn.Module):
    """Grouped conv (radix-expanded) + split attention
    (reference att.py:192)."""

    in_channels: Optional[int] = None
    out_channels: int = 0
    kernel_size: Any = 3
    stride: Any = 1
    padding: Any = 1
    dilation: Any = 1
    groups: int = 1
    bias: bool = False
    radix: int = 2
    normalization: Any = lambda_batchnorm2d()
    activation: Any = lambda_relu()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBlock(
            out_channels=self.out_channels * self.radix,
            kernel_size=self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups * self.radix,
            bias=self.bias,
            normalization=self.normalization,
            activation=self.activation,
            name="conv",
        )(x, train=train)
        x = SABlock(out_channels=self.out_channels, groups=self.groups,
                    radix=self.radix, name="att")(x, train=train)
        return x


def saconv3x3_block(**kwargs) -> SAConvBlock:
    """3x3 split-attention conv block (reference att.py:269)."""
    return SAConvBlock(kernel_size=3, padding=kwargs.pop("padding", 1),
                       **kwargs)
