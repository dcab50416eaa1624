"""IBPPose for COCO Keypoint, TPU-native (JAX/flax, NHWC).

Behavioral reference: pytorchcv ``models/ibppose_coco.py`` (
IbpResBottleneck:17, IbpResUnit:66, IbpBackbone:119, IbpDownBlock:180,
IbpUpBlock:207, MergeBlock:252, IbpPreBlock:276, IbpPass:315,
IbpPose:407, get_ibppose:495) — a 4-pass stacked hourglass with
inter-pass merge connections, leaky-ReLU activations and an SE gate in the
preliminary decoder block. Each pass's hourglass is expressed through the
shared :class:`Hourglass` vocabulary cell (static python recursion —
XLA sees one flat graph and fuses the add-merges into the up-convs).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (Hourglass, InterpolationBlock, SEBlock, Sequential,
                  conv1x1_block, conv3x3_block, conv7x7_block,
                  lambda_batchnorm2d, lambda_leakyrelu, lambda_relu,
                  max_pool2d)
from ..nn.activ import create_activation_layer
from ..nn.base import IntPair
from .registry import register_model

__all__ = ["IbpPose", "IbpResUnit", "get_ibppose"]


class IbpResBottleneck(nn.Module):
    """Residual-path bottleneck (reference ibppose_coco.py:17)."""

    out_channels: int = 0
    stride: IntPair = 1
    bias: bool = False
    bottleneck_factor: int = 2
    activation: Any = lambda_relu()

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = self.out_channels // self.bottleneck_factor
        x = conv1x1_block(out_channels=mid_channels, bias=self.bias,
                          activation=self.activation, name="conv1")(
                              x, train=train)
        x = conv3x3_block(out_channels=mid_channels, stride=self.stride,
                          bias=self.bias, activation=self.activation,
                          name="conv2")(x, train=train)
        x = conv1x1_block(out_channels=self.out_channels, bias=self.bias,
                          activation=None, name="conv3")(x, train=train)
        return x


class IbpResUnit(nn.Module):
    """ResNet-like unit with factor-2 bottleneck (reference
    ibppose_coco.py:66)."""

    out_channels: int = 0
    stride: IntPair = 1
    bias: bool = False
    bottleneck_factor: int = 2
    activation: Any = lambda_relu()

    @nn.compact
    def __call__(self, x, train: bool = False):
        resize_identity = (x.shape[-1] != self.out_channels) or \
            (self.stride != 1)
        if resize_identity:
            identity = conv1x1_block(
                out_channels=self.out_channels, stride=self.stride,
                bias=self.bias, activation=None, name="identity_conv")(
                    x, train=train)
        else:
            identity = x
        x = IbpResBottleneck(out_channels=self.out_channels,
                             stride=self.stride, bias=self.bias,
                             bottleneck_factor=self.bottleneck_factor,
                             activation=self.activation, name="body")(
                                 x, train=train)
        x = x + identity
        return create_activation_layer(self.activation, name="activ")(x)


class IbpBackbone(nn.Module):
    """IBPPose backbone: stem + parallel dilation branch, concatenated
    (reference ibppose_coco.py:119)."""

    out_channels: int = 256
    activation: Any = lambda_leakyrelu()

    @nn.compact
    def __call__(self, x, train: bool = False):
        dilations = (3, 3, 4, 4, 5, 5)
        mid1_channels = self.out_channels // 4
        mid2_channels = self.out_channels // 2
        x = conv7x7_block(out_channels=mid1_channels, stride=2,
                          activation=self.activation, name="conv1")(
                              x, train=train)
        x = IbpResUnit(out_channels=mid2_channels,
                       activation=self.activation, name="res1")(
                           x, train=train)
        x = max_pool2d(kernel_size=2, stride=2)(x)
        x = IbpResUnit(out_channels=mid2_channels,
                       activation=self.activation, name="res2")(
                           x, train=train)
        branch = Sequential(layers=tuple(
            conv3x3_block(out_channels=mid2_channels, padding=d, dilation=d,
                          activation=self.activation, name=f"block{i + 1}",
                          parent=None)
            for i, d in enumerate(dilations)), name="dilation_branch")
        y = branch(x, train=train)
        return jnp.concatenate([x, y], axis=-1)


class IbpDownBlock(nn.Module):
    """maxpool/2 + residual unit (reference ibppose_coco.py:180)."""

    out_channels: int = 0
    activation: Any = lambda_leakyrelu()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = max_pool2d(kernel_size=2, stride=2)(x)
        return IbpResUnit(out_channels=self.out_channels,
                          activation=self.activation, name="res")(
                              x, train=train)


class IbpUpBlock(nn.Module):
    """residual unit + nearest 2x upsample + conv3x3 (reference
    ibppose_coco.py:207)."""

    out_channels: int = 0
    bias: bool = False
    normalization: Any = lambda_batchnorm2d()
    activation: Any = lambda_leakyrelu()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = IbpResUnit(out_channels=self.out_channels,
                       activation=self.activation, name="res")(x, train=train)
        x = InterpolationBlock(scale_factor=2, mode="nearest",
                               align_corners=None)(x)
        return conv3x3_block(out_channels=self.out_channels, bias=self.bias,
                             normalization=self.normalization,
                             activation=self.activation, name="conv")(
                                 x, train=train)


class MergeBlock(nn.Module):
    """1x1 conv block, no activation (reference ibppose_coco.py:252)."""

    out_channels: int = 0
    bias: bool = False
    normalization: Any = lambda_batchnorm2d()

    @nn.compact
    def __call__(self, x, train: bool = False):
        return conv1x1_block(out_channels=self.out_channels, bias=self.bias,
                             normalization=self.normalization,
                             activation=None, name="conv")(x, train=train)


class IbpPreBlock(nn.Module):
    """Two conv3x3 blocks + dense-parameterized SE gate (reference
    ibppose_coco.py:276)."""

    out_channels: int = 0
    bias: bool = False
    normalization: Any = lambda_batchnorm2d()
    activation: Any = lambda_leakyrelu()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.out_channels, bias=self.bias,
                          normalization=self.normalization,
                          activation=self.activation, name="conv1")(
                              x, train=train)
        x = conv3x3_block(out_channels=self.out_channels, bias=self.bias,
                          normalization=self.normalization,
                          activation=self.activation, name="conv2")(
                              x, train=train)
        return SEBlock(use_conv=False, mid_activation=self.activation,
                       name="se")(x, train=train)


class IbpPass(nn.Module):
    """Single hourglass pass with optional merge heads (reference
    ibppose_coco.py:315)."""

    channels: int = 256
    mid_channels: int = 50
    depth: int = 4
    growth_rate: int = 128
    merge: bool = True
    bias: bool = False
    normalization: Any = lambda_batchnorm2d()
    activation: Any = lambda_leakyrelu()

    @nn.compact
    def __call__(self, x, x_prev, train: bool = False):
        downs, ups, skips = [], [], []
        top_channels = self.channels
        bottom_channels = self.channels
        for i in range(self.depth + 1):
            skips.append(IbpResUnit(out_channels=top_channels,
                                    activation=self.activation,
                                    name=f"skip{i + 1}", parent=None))
            bottom_channels += self.growth_rate
            if i < self.depth:
                downs.append(IbpDownBlock(out_channels=bottom_channels,
                                          activation=self.activation,
                                          name=f"down{i + 1}", parent=None))
                ups.append(IbpUpBlock(out_channels=top_channels,
                                      bias=self.bias,
                                      normalization=self.normalization,
                                      activation=self.activation,
                                      name=f"up{i + 1}", parent=None))
            top_channels = bottom_channels
        x = Hourglass(down_seq=tuple(downs), up_seq=tuple(ups),
                      skip_seq=tuple(skips), name="hg")(x, train=train)
        if x_prev is not None:
            x = x + x_prev
        y = IbpPreBlock(out_channels=self.channels, bias=self.bias,
                        normalization=self.normalization,
                        activation=self.activation, name="pre_block")(
                            x, train=train)
        z = conv1x1_block(out_channels=self.mid_channels, bias=True,
                          normalization=None, activation=None,
                          name="post_block")(y, train=train)
        if self.merge:
            z = MergeBlock(out_channels=self.channels, bias=self.bias,
                           normalization=self.normalization,
                           name="post_merge_block")(z, train=train) + \
                MergeBlock(out_channels=self.channels, bias=self.bias,
                           normalization=self.normalization,
                           name="pre_merge_block")(y, train=train)
        return z


class _IbpDecoder(nn.Module):
    """Pass stack with the inter-pass accumulation wiring (reference
    IbpPose.forward:478); scoped ``decoder`` to mirror the checkpoint."""

    passes: int = 4
    channels: int = 256
    outs_channels: int = 50
    depth: int = 4
    growth_rate: int = 128
    bias: bool = False
    normalization: Any = lambda_batchnorm2d()
    activation: Any = lambda_leakyrelu()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x_prev = None
        for i in range(self.passes):
            unit = IbpPass(channels=self.channels,
                           mid_channels=self.outs_channels, depth=self.depth,
                           growth_rate=self.growth_rate,
                           merge=(i != self.passes - 1), bias=self.bias,
                           normalization=self.normalization,
                           activation=self.activation, name=f"pass{i + 1}")
            if x_prev is not None:
                x = x + x_prev
            x_prev = unit(x, x_prev, train=train)
        return x_prev


class IbpPose(nn.Module):
    """IBPPose (reference ibppose_coco.py:407) from 'Simple Pose: Rethinking
    and Improving a Bottom-up Approach for Multi-Person Pose Estimation'
    https://arxiv.org/abs/1911.10529. Output: (B, H/4, W/4, 50) NHWC."""

    passes: int = 4
    backbone_out_channels: int = 256
    outs_channels: int = 50
    depth: int = 4
    growth_rate: int = 128
    use_bn: bool = True
    in_channels: int = 3
    in_size: Tuple[int, int] = (256, 256)

    @nn.compact
    def __call__(self, x, train: bool = False):
        bias = not self.use_bn
        normalization = lambda_batchnorm2d() if self.use_bn else None
        activation = lambda_leakyrelu()
        x = IbpBackbone(out_channels=self.backbone_out_channels,
                        activation=activation, name="backbone")(
                            x, train=train)
        return _IbpDecoder(passes=self.passes,
                           channels=self.backbone_out_channels,
                           outs_channels=self.outs_channels,
                           depth=self.depth, growth_rate=self.growth_rate,
                           bias=bias, normalization=normalization,
                           activation=activation, name="decoder")(
                               x, train=train)


def get_ibppose(**kwargs) -> IbpPose:
    """Config expander (reference ibppose_coco.py:495)."""
    return IbpPose(passes=4, backbone_out_channels=256, outs_channels=50,
                   depth=4, growth_rate=128, use_bn=True, **kwargs)


@register_model("ibppose_coco")
def ibppose_coco(**kwargs):
    return get_ibppose(**kwargs)
