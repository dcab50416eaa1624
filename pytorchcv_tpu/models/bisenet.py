"""BiSeNet, TPU-native. Behavioral reference: pytorchcv ``models/bisenet.py``
(PyramidPoolingZeroBranch:15, AttentionRefinementBlock:55,
PyramidPoolingMainBranch:90, FeatureFusion:132, PyramidPooling:183,
BiSeHead:230, BiSeNet:262, bisenet_resnet18_celebamaskhq:373)."""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (InterpolationBlock, MultiOutputSequential, conv1x1,
                  conv1x1_block, conv3x3_block)
from ..nn.activ import lambda_sigmoid
from ..nn.base import Composed, Held
from .registry import register_model
from .resnet import resnet_features

__all__ = ["BiSeNet", "get_bisenet"]


class PyramidPoolingZeroBranch(nn.Module):
    """Global-pool branch (reference bisenet.py:15)."""

    out_channels: int = 0
    in_size: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_size = self.in_size if self.in_size is not None else x.shape[1:3]
        y = x.mean(axis=(1, 2), keepdims=True)
        y = conv1x1_block(out_channels=self.out_channels,
                          name="conv")(y, train=train)
        return InterpolationBlock(mode="nearest", align_corners=None)(
            y, size=in_size)


class AttentionRefinementBlock(nn.Module):
    """ARM: conv + global sigmoid gate (reference bisenet.py:55)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.out_channels,
                          name="conv1")(x, train=train)
        w = x.mean(axis=(1, 2), keepdims=True)
        w = conv1x1_block(out_channels=self.out_channels,
                          activation=lambda_sigmoid(),
                          name="conv2")(w, train=train)
        return x * w


class PyramidPoolingMainBranch(nn.Module):
    """ARM + add + x2 up + conv (reference bisenet.py:90)."""

    out_channels: int = 0
    scale_factor: int = 2

    @nn.compact
    def __call__(self, x, y, train: bool = False):
        x = AttentionRefinementBlock(out_channels=self.out_channels,
                                     name="att")(x, train=train)
        x = x + y
        x = InterpolationBlock(mode="nearest", align_corners=None)(
            x, size=(self.scale_factor * x.shape[1],
                     self.scale_factor * x.shape[2]))
        return conv3x3_block(out_channels=self.out_channels,
                             name="conv")(x, train=train)


class FeatureFusion(nn.Module):
    """FFM (reference bisenet.py:132)."""

    out_channels: int = 0
    reduction: int = 4

    @nn.compact
    def __call__(self, x, y, train: bool = False):
        mid_channels = self.out_channels // self.reduction
        x = jnp.concatenate([x, y], axis=-1)
        x = conv1x1_block(out_channels=self.out_channels,
                          name="conv_merge")(x, train=train)
        w = x.mean(axis=(1, 2), keepdims=True)
        w = conv1x1(out_channels=mid_channels, name="conv1")(w)
        w = nn.relu(w)
        w = conv1x1(out_channels=self.out_channels, name="conv2")(w)
        w = nn.sigmoid(w)
        return x + x * w


class BiSePyramidPooling(nn.Module):
    """Context-path pyramid (reference bisenet.py:183)."""

    y_out_channels: int = 0
    y32_out_size: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, x8, x16, x32, train: bool = False):
        z_out_channels = 2 * self.y_out_channels
        y32 = PyramidPoolingZeroBranch(out_channels=self.y_out_channels,
                                       in_size=self.y32_out_size,
                                       name="pool32")(x32, train=train)
        y16 = PyramidPoolingMainBranch(out_channels=self.y_out_channels,
                                       scale_factor=2,
                                       name="pool16")(x32, y32, train=train)
        y8 = PyramidPoolingMainBranch(out_channels=self.y_out_channels,
                                      scale_factor=2,
                                      name="pool8")(x16, y16, train=train)
        z8 = FeatureFusion(out_channels=z_out_channels,
                           name="fusion")(x8, y8, train=train)
        return z8, y8, y16


class BiSeHead(nn.Module):
    """3x3 block + 1x1 classifier (reference bisenet.py:230)."""

    mid_channels: int = 0
    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.mid_channels,
                          name="conv1")(x, train=train)
        return conv1x1(out_channels=self.out_channels, name="conv2")(x)


class BiSeNet(Composed):
    """BiSeNet (reference bisenet.py:262)."""

    backbone: Any = None
    backbone_out_channels: Tuple = (128, 256, 512)
    aux: bool = True
    fixed_size: bool = True
    in_size: Tuple[int, int] = (640, 480)
    in_channels: int = 3
    num_classes: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        y_out_channels = self.backbone_out_channels[0]
        z_out_channels = 2 * y_out_channels
        y32_out_size = (self.in_size[0] // 32, self.in_size[1] // 32) \
            if self.fixed_size else None
        x8, x16, x32 = self.adopt_call(self.backbone, x, train=train)
        z8, y8, y16 = BiSePyramidPooling(
            y_out_channels=y_out_channels, y32_out_size=y32_out_size,
            name="pool")(x8, x16, x32, train=train)
        z8 = BiSeHead(mid_channels=z_out_channels,
                      out_channels=self.num_classes,
                      name="head_z8")(z8, train=train)
        z8 = InterpolationBlock()(z8, size=(8 * z8.shape[1],
                                            8 * z8.shape[2]))
        if self.aux:
            mid = y_out_channels // 2
            y8 = BiSeHead(mid_channels=mid, out_channels=self.num_classes,
                          name="head_y8")(y8, train=train)
            y16 = BiSeHead(mid_channels=mid, out_channels=self.num_classes,
                           name="head_y16")(y16, train=train)
            y8 = InterpolationBlock()(y8, size=(8 * y8.shape[1],
                                                8 * y8.shape[2]))
            y16 = InterpolationBlock()(y16, size=(16 * y16.shape[1],
                                                  16 * y16.shape[2]))
            return z8, y8, y16
        return z8


def get_bisenet(backbone, **kwargs):
    """Config expander (reference bisenet.py:341)."""
    return BiSeNet(backbone=backbone, **kwargs)


@register_model("bisenet_resnet18_celebamaskhq")
def bisenet_resnet18_celebamaskhq(num_classes: int = 19, **kwargs):
    # resnet18 trunk tapped at stages 2..4 (reference bisenet.py:373-398)
    feats = resnet_features(
        channels=[[64, 64], [128, 128], [256, 256], [512, 512]],
        init_block_channels=64, bottleneck=False, conv1_stride=True,
        final_pool=False)

    def unwrap(m):
        return m.module if isinstance(m, Held) else m

    layers = tuple(unwrap(l) for l in feats.layers)
    backbone = MultiOutputSequential(layers=layers, output_idx=(2, 3, 4),
                                     return_last=False, name="backbone")
    return get_bisenet(backbone=backbone, num_classes=num_classes, **kwargs)
