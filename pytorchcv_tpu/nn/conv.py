"""Convolution block vocabulary (TPU-native analog of reference ``common/conv.py``).

The universal cell is ``ConvBlock`` = conv + norm + activation
(reference conv.py:204-286). On TPU this whole cell is one XLA fusion: the
convolution runs on the MXU and the norm/activation epilogue fuses into it,
so the block is expressed at the highest level and left to the compiler.

Layout is NHWC (kernel HWIO); asymmetric torch paddings map directly onto
XLA's per-dimension (lo, hi) conv padding (no explicit pad op).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from .activ import create_activation_layer, lambda_relu
from .base import (IntPair, Padding2d, call_block, conv_kernel_init, to_2tuple,
                   to_pad1d, to_pad2d)
from .norm import create_normalization_layer, lambda_batchnorm1d, lambda_batchnorm2d

__all__ = [
    "conv1x1", "conv3x3", "depthwise_conv3x3",
    "ConvBlock", "ConvBlock1d", "conv1x1_block", "conv3x3_block",
    "conv5x5_block", "conv7x7_block", "dwconv_block", "dwconv3x3_block",
    "dwconv5x5_block", "DwsConvBlock", "dwsconv3x3_block", "PreConvBlock",
    "pre_conv1x1_block", "pre_conv3x3_block", "AsymConvBlock",
    "asym_conv3x3_block", "ConvTranspose2d", "DeconvBlock", "deconv3x3_block",
]


def _conv2d(out_channels, kernel_size, stride=1, padding=0, dilation=1,
            groups=1, bias=False, name="conv", **kw):
    """Unwrapped nn.Conv so the param path is ``<name>/kernel`` directly."""
    return nn.Conv(
        features=out_channels,
        kernel_size=to_2tuple(kernel_size),
        strides=to_2tuple(stride),
        padding=to_pad2d(padding),
        kernel_dilation=to_2tuple(dilation),
        feature_group_count=groups,
        use_bias=bias,
        kernel_init=conv_kernel_init,
        name=name,
        **kw,
    )


def conv1x1(in_channels=None, out_channels=0, stride=1, groups=1, bias=False,
            name="conv", **kw):
    """1x1 convolution layer (reference conv.py:89)."""
    del in_channels
    return _conv2d(out_channels, 1, stride=stride, groups=groups, bias=bias,
                   name=name, **kw)


def conv3x3(in_channels=None, out_channels=0, stride=1, padding=1, dilation=1,
            groups=1, bias=False, name="conv", **kw):
    """3x3 convolution layer (reference conv.py:124)."""
    del in_channels
    return _conv2d(out_channels, 3, stride=stride, padding=padding,
                   dilation=dilation, groups=groups, bias=bias, name=name,
                   **kw)


def depthwise_conv3x3(channels=0, stride=1, padding=1, dilation=1, bias=False,
                      name="conv", **kw):
    """Depthwise 3x3 convolution layer (reference conv.py:167)."""
    return _conv2d(channels, 3, stride=stride, padding=padding,
                   dilation=dilation, groups=channels, bias=bias, name=name,
                   **kw)


class ConvBlock(nn.Module):
    """conv + norm + activation (reference conv.py:204).

    ``in_channels`` is accepted for config-table parity but unused (linen
    infers input features). ``normalization``/``activation`` follow the
    factory protocol from ``nn.base``.
    """

    in_channels: Optional[int] = None
    out_channels: int = 0
    kernel_size: IntPair = 1
    stride: IntPair = 1
    padding: Padding2d = 0
    dilation: IntPair = 1
    groups: int = 1
    bias: bool = False
    normalization: Any = lambda_batchnorm2d()
    activation: Any = lambda_relu()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv2d(self.out_channels, self.kernel_size, self.stride,
                    self.padding, self.dilation, self.groups, self.bias,
                    name="conv")(x)
        norm = create_normalization_layer(self.normalization, name="bn",
                                          channels=self.out_channels)
        if norm is not None:
            x = norm(x, train=train)
        act = create_activation_layer(self.activation, name="activ")
        if act is not None:
            x = act(x)
        return x


class ConvBlock1d(nn.Module):
    """1D conv + norm + activation, NWC (reference conv.py:16)."""

    in_channels: Optional[int] = None
    out_channels: int = 0
    kernel_size: int = 1
    stride: int = 1
    padding: Union[int, Tuple[int, int]] = 0
    dilation: int = 1
    groups: int = 1
    bias: bool = False
    normalization: Any = lambda_batchnorm1d()
    activation: Any = lambda_relu()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            features=self.out_channels,
            kernel_size=(int(self.kernel_size),),
            strides=(int(self.stride),),
            padding=to_pad1d(self.padding),
            kernel_dilation=(int(self.dilation),),
            feature_group_count=self.groups,
            use_bias=self.bias,
            kernel_init=conv_kernel_init,
            name="conv",
        )(x)
        norm = create_normalization_layer(self.normalization, name="bn",
                                          channels=self.out_channels)
        if norm is not None:
            x = norm(x, train=train)
        act = create_activation_layer(self.activation, name="activ")
        if act is not None:
            x = act(x)
        return x


def conv1x1_block(padding: Padding2d = 0, **kwargs) -> ConvBlock:
    """1x1 ConvBlock (reference conv.py:289)."""
    return ConvBlock(kernel_size=1, padding=padding, **kwargs)


def conv3x3_block(padding: Padding2d = 1, **kwargs) -> ConvBlock:
    """3x3 ConvBlock (reference conv.py:326)."""
    return ConvBlock(kernel_size=3, padding=padding, **kwargs)


def conv5x5_block(padding: Padding2d = 2, **kwargs) -> ConvBlock:
    """5x5 ConvBlock (reference conv.py:363)."""
    return ConvBlock(kernel_size=5, padding=padding, **kwargs)


def conv7x7_block(padding: Padding2d = 3, **kwargs) -> ConvBlock:
    """7x7 ConvBlock (reference conv.py:400)."""
    return ConvBlock(kernel_size=7, padding=padding, **kwargs)


def dwconv_block(out_channels=0, **kwargs) -> ConvBlock:
    """Depthwise ConvBlock (reference conv.py:437)."""
    return ConvBlock(out_channels=out_channels, groups=out_channels, **kwargs)


def dwconv3x3_block(padding: Padding2d = 1, **kwargs) -> ConvBlock:
    """Depthwise 3x3 ConvBlock (reference conv.py:476)."""
    return dwconv_block(kernel_size=3, padding=padding, **kwargs)


def dwconv5x5_block(padding: Padding2d = 2, **kwargs) -> ConvBlock:
    """Depthwise 5x5 ConvBlock (reference conv.py:511)."""
    return dwconv_block(kernel_size=5, padding=padding, **kwargs)


class DwsConvBlock(nn.Module):
    """Depthwise-separable conv block: dw ConvBlock + pw ConvBlock
    (reference conv.py:546). ``dw_activation``/``pw_activation`` follow the
    activation spec protocol.
    """

    in_channels: Optional[int] = None
    out_channels: int = 0
    kernel_size: IntPair = 3
    stride: IntPair = 1
    padding: Padding2d = 1
    dilation: IntPair = 1
    bias: bool = False
    dw_use_bn: bool = True
    pw_use_bn: bool = True
    normalization: Any = lambda_batchnorm2d()
    dw_activation: Any = lambda_relu()
    pw_activation: Any = lambda_relu()

    @nn.compact
    def __call__(self, x, train: bool = False):
        dw_channels = x.shape[-1]
        x = ConvBlock(
            out_channels=dw_channels,
            kernel_size=self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=dw_channels,
            bias=self.bias,
            normalization=self.normalization if self.dw_use_bn else None,
            activation=self.dw_activation,
            name="dw_conv",
        )(x, train=train)
        x = ConvBlock(
            out_channels=self.out_channels,
            kernel_size=1,
            bias=self.bias,
            normalization=self.normalization if self.pw_use_bn else None,
            activation=self.pw_activation,
            name="pw_conv",
        )(x, train=train)
        return x


def dwsconv3x3_block(padding: Padding2d = 1, **kwargs) -> DwsConvBlock:
    """3x3 depthwise-separable block (reference conv.py:611)."""
    return DwsConvBlock(kernel_size=3, padding=padding, **kwargs)


class PreConvBlock(nn.Module):
    """Pre-activation block: norm -> activation -> conv
    (reference conv.py:652). ``return_preact`` additionally returns the
    pre-activation tensor (used by PreResNet downsample taps).
    """

    in_channels: Optional[int] = None
    out_channels: int = 0
    kernel_size: IntPair = 1
    stride: IntPair = 1
    padding: Padding2d = 0
    dilation: IntPair = 1
    bias: bool = False
    use_bn: bool = True
    return_preact: bool = False
    activate: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.use_bn:
            from .norm import BatchNorm
            x = BatchNorm(name="bn")(x, train=train)
        if self.activate:
            x = nn.relu(x)
        if self.return_preact:
            x_pre_activ = x
        x = _conv2d(self.out_channels, self.kernel_size, self.stride,
                    self.padding, self.dilation, bias=self.bias,
                    name="conv")(x)
        if self.return_preact:
            return x, x_pre_activ
        return x


def pre_conv1x1_block(padding: Padding2d = 0, **kwargs) -> PreConvBlock:
    """1x1 pre-activation block (reference conv.py:735)."""
    return PreConvBlock(kernel_size=1, padding=padding, **kwargs)


def pre_conv3x3_block(padding: Padding2d = 1, **kwargs) -> PreConvBlock:
    """3x3 pre-activation block (reference conv.py:774)."""
    return PreConvBlock(kernel_size=3, padding=padding, **kwargs)


class AsymConvBlock(nn.Module):
    """Asymmetric factorized conv: (k, 1) then (1, k) ConvBlocks
    (reference conv.py:813)."""

    in_channels: Optional[int] = None
    channels: int = 0
    kernel_size: int = 3
    padding: int = 1
    dilation: int = 1
    groups: int = 1
    bias: bool = False
    lw_use_bn: bool = True
    rw_use_bn: bool = True
    normalization: Any = lambda_batchnorm2d()
    lw_activation: Any = lambda_relu()
    rw_activation: Any = lambda_relu()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBlock(
            out_channels=self.channels,
            kernel_size=(self.kernel_size, 1),
            padding=(self.padding, 0),
            dilation=(self.dilation, 1),
            groups=self.groups,
            bias=self.bias,
            normalization=self.normalization if self.lw_use_bn else None,
            activation=self.lw_activation,
            name="lw_conv",
        )(x, train=train)
        x = ConvBlock(
            out_channels=self.channels,
            kernel_size=(1, self.kernel_size),
            padding=(0, self.padding),
            dilation=(1, self.dilation),
            groups=self.groups,
            bias=self.bias,
            normalization=self.normalization if self.rw_use_bn else None,
            activation=self.rw_activation,
            name="rw_conv",
        )(x, train=train)
        return x


def asym_conv3x3_block(**kwargs) -> AsymConvBlock:
    """3x3 asymmetric conv block (reference conv.py:~900)."""
    return AsymConvBlock(kernel_size=3, padding=1, **kwargs)


class ConvTranspose2d(nn.Module):
    """Transposed 2D convolution with torch semantics, NHWC.

    Output spatial size: (in-1)*stride - 2*padding + dilation*(k-1)
    + out_padding + 1. Implemented as an input-dilated (fractionally strided)
    forward conv, which XLA lowers onto the MXU directly.

    Parameter ``kernel`` is stored as (kH, kW, O, I) — exactly what the
    generic converter's rank-4 rule (torch (I, O, kH, kW) -> transpose
    (2, 3, 1, 0)) produces — so conv and deconv share ONE unambiguous
    conversion rule (a shape-based fallback would silently mis-convert
    square-channel deconvs). The in/out swap happens here at trace time
    and folds into the kernel constant under jit.
    """

    out_channels: int
    kernel_size: IntPair = 4
    stride: IntPair = 2
    padding: Padding2d = 1
    out_padding: IntPair = 0
    dilation: IntPair = 1
    groups: int = 1
    bias: bool = False

    @nn.compact
    def __call__(self, x):
        import jax.lax as lax
        assert self.groups == 1, "grouped deconv not supported yet"
        kh, kw = to_2tuple(self.kernel_size)
        sh, sw = to_2tuple(self.stride)
        dh, dw = to_2tuple(self.dilation)
        (pt, pb), (pl, pr) = to_pad2d(self.padding)
        oph, opw = to_2tuple(self.out_padding)

        kernel = self.param(
            "kernel", conv_kernel_init,
            (kh, kw, self.out_channels, x.shape[-1]))
        kernel = jnp.swapaxes(kernel, 2, 3)  # -> (kH, kW, I, O)
        # Transposed conv == forward conv over the stride-dilated input with
        # a spatially flipped kernel and padding d*(k-1) - p (+ out_padding hi).
        pad = (
            (dh * (kh - 1) - pt, dh * (kh - 1) - pb + oph),
            (dw * (kw - 1) - pl, dw * (kw - 1) - pr + opw),
        )
        y = lax.conv_general_dilated(
            x, jnp.flip(kernel, (0, 1)).astype(x.dtype),
            window_strides=(1, 1),
            padding=pad,
            lhs_dilation=(sh, sw),
            rhs_dilation=(dh, dw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        if self.bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            y = y + b.astype(y.dtype)
        return y


class DeconvBlock(nn.Module):
    """Transposed conv + norm + activation (reference conv.py:919).

    ``ext_padding`` (the reference's pre-deconv ZeroPad2d) is an explicit
    input pad: padded pixels are real input positions under lhs-dilation, so
    this matches torch bit-for-bit.
    """

    in_channels: Optional[int] = None
    out_channels: int = 0
    kernel_size: IntPair = 4
    stride: IntPair = 2
    padding: Padding2d = 1
    ext_padding: Optional[Tuple[int, int, int, int]] = None
    out_padding: IntPair = 0
    dilation: IntPair = 1
    groups: int = 1
    bias: bool = False
    normalization: Any = lambda_batchnorm2d()
    activation: Any = lambda_relu()

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.ext_padding is not None:
            el, er, et, eb = self.ext_padding
            x = jnp.pad(x, ((0, 0), (et, eb), (el, er), (0, 0)))
        x = ConvTranspose2d(
            out_channels=self.out_channels,
            kernel_size=self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            out_padding=self.out_padding,
            dilation=self.dilation,
            groups=self.groups,
            bias=self.bias,
            name="conv",
        )(x)
        norm = create_normalization_layer(self.normalization, name="bn",
                                          channels=self.out_channels)
        if norm is not None:
            x = norm(x, train=train)
        act = create_activation_layer(self.activation, name="activ")
        if act is not None:
            x = act(x)
        return x


def deconv3x3_block(padding: Padding2d = 1, out_padding: IntPair = 1,
                    **kwargs) -> DeconvBlock:
    """3x3 deconvolution block (reference conv.py:1007)."""
    return DeconvBlock(kernel_size=3, padding=padding, out_padding=out_padding,
                       **kwargs)
