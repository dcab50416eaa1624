"""DeepLabv3, TPU-native. Behavioral reference: pytorchcv
``models/deeplabv3.py`` (DeepLabv3FinalBlock:19, ASPPAvgBranch:43,
AtrousSpatialPyramidPooling:76, DeepLabv3:122, variants :259+)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (Concurrent, conv1x1, conv1x1_block, conv3x3_block,
                  interpolate)
from ..nn.base import Composed
from .pspnet import segmentation_backbone
from .registry import register_model

__all__ = ["DeepLabv3", "get_deeplabv3"]


class DeepLabv3FinalBlock(nn.Module):
    """3x3 conv block -> dropout -> 1x1 conv -> bilinear up
    (reference deeplabv3.py:19)."""

    out_channels: int = 0
    bottleneck_factor: int = 4

    @nn.compact
    def __call__(self, x, out_size, train: bool = False):
        in_channels = x.shape[-1]
        assert in_channels % self.bottleneck_factor == 0
        mid_channels = in_channels // self.bottleneck_factor
        x = conv3x3_block(out_channels=mid_channels, name="conv1")(
            x, train=train)
        if train:
            x = nn.Dropout(rate=0.1, deterministic=False,
                           name="dropout")(x)
        x = conv1x1(out_channels=self.out_channels, bias=True,
                    name="conv2")(x)
        return interpolate(x, out_size, mode="bilinear", align_corners=True)


class ASPPAvgBranch(nn.Module):
    """global pool -> 1x1 conv block -> bilinear up
    (reference deeplabv3.py:43)."""

    out_channels: int = 0
    upscale_out_size: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_size = (self.upscale_out_size if self.upscale_out_size is not None
                   else x.shape[1:3])
        x = jnp.mean(x, axis=(1, 2), keepdims=True)
        x = conv1x1_block(out_channels=self.out_channels, name="conv")(
            x, train=train)
        return interpolate(x, in_size, mode="bilinear", align_corners=True)


class AtrousSpatialPyramidPooling(nn.Module):
    """1x1 + 3 atrous 3x3 + global branch, project, dropout
    (reference deeplabv3.py:76)."""

    in_channels: int = 2048
    upscale_out_size: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        atrous_rates = [12, 24, 36]
        mid_channels = self.in_channels // 8
        branches = [conv1x1_block(out_channels=mid_channels, name="branch1",
                                  parent=None)]
        for i, rate in enumerate(atrous_rates):
            branches.append(conv3x3_block(
                out_channels=mid_channels, padding=rate, dilation=rate,
                name=f"branch{i + 2}", parent=None))
        branches.append(ASPPAvgBranch(
            out_channels=mid_channels,
            upscale_out_size=self.upscale_out_size, name="branch5",
            parent=None))
        x = Concurrent(layers=tuple(branches), name="branches")(
            x, train=train)
        x = conv1x1_block(out_channels=mid_channels, name="conv")(
            x, train=train)
        if train:
            x = nn.Dropout(rate=0.5, deterministic=False,
                           name="dropout")(x)
        return x


class DeepLabv3(Composed):
    """DeepLabv3 (reference deeplabv3.py:122)."""

    backbone: object = None
    backbone_out_channels: int = 2048
    aux: bool = False
    fixed_size: bool = True
    in_channels: int = 3
    in_size: Tuple[int, int] = (480, 480)
    num_classes: int = 21

    @nn.compact
    def __call__(self, x, train: bool = False, from_features: bool = False):
        """``from_features=True``: ``x`` is the backbone output tuple
        (stage4, stage3-bend) — head-only entry for the int8 serving
        pipeline (quant/seg_backbone_int8.py)."""
        assert self.fixed_size or not from_features, \
            "from_features requires fixed_size (static upsample target)"
        in_size = self.in_size if self.fixed_size else x.shape[1:3]
        pool_out_size = ((self.in_size[0] // 8, self.in_size[1] // 8)
                         if self.fixed_size else None)
        outs = x if from_features else \
            self.adopt_call(self.backbone, x, train=train)
        x, y = outs[0], outs[1]
        x = AtrousSpatialPyramidPooling(
            in_channels=self.backbone_out_channels,
            upscale_out_size=pool_out_size, name="pool")(x, train=train)
        x = DeepLabv3FinalBlock(out_channels=self.num_classes,
                                bottleneck_factor=1, name="final_block")(
                                    x, in_size, train=train)
        if self.aux:
            y = DeepLabv3FinalBlock(out_channels=self.num_classes,
                                    bottleneck_factor=4, name="aux_block")(
                                        y, in_size, train=train)
            return x, y
        return x


def get_deeplabv3(backbone, backbone_out_channels: int = 2048,
                  num_classes: int = 21, aux: bool = False, **kwargs):
    return DeepLabv3(backbone=backbone,
                     backbone_out_channels=backbone_out_channels,
                     num_classes=num_classes, aux=aux, **kwargs)


def _variant(name, blocks, num_classes):
    @register_model(name)
    def ctor(num_classes: int = num_classes, aux: bool = True, **kwargs):
        backbone = segmentation_backbone(blocks)
        return get_deeplabv3(backbone=backbone, num_classes=num_classes,
                             aux=aux, **kwargs)
    ctor.__name__ = name
    return ctor


deeplabv3_resnetd50b_voc = _variant("deeplabv3_resnetd50b_voc", 50, 21)
deeplabv3_resnetd101b_voc = _variant("deeplabv3_resnetd101b_voc", 101, 21)
deeplabv3_resnetd152b_voc = _variant("deeplabv3_resnetd152b_voc", 152, 21)
deeplabv3_resnetd50b_coco = _variant("deeplabv3_resnetd50b_coco", 50, 21)
deeplabv3_resnetd101b_coco = _variant("deeplabv3_resnetd101b_coco", 101, 21)
deeplabv3_resnetd152b_coco = _variant("deeplabv3_resnetd152b_coco", 152, 21)
deeplabv3_resnetd50b_ade20k = _variant("deeplabv3_resnetd50b_ade20k",
                                       50, 150)
deeplabv3_resnetd101b_ade20k = _variant("deeplabv3_resnetd101b_ade20k",
                                        101, 150)
deeplabv3_resnetd50b_cityscapes = _variant(
    "deeplabv3_resnetd50b_cityscapes", 50, 19)
deeplabv3_resnetd101b_cityscapes = _variant(
    "deeplabv3_resnetd101b_cityscapes", 101, 19)
