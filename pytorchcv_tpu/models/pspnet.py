"""PSPNet, TPU-native. Behavioral reference: pytorchcv ``models/pspnet.py``
(PSPFinalBlock:19, PyramidPoolingBranch:56, PyramidPooling:93, PSPNet:126,
get_pspnet:209, variants :250+). Static ``fixed_size`` path: all adaptive
pools and bilinear upsamples compile with static shapes.
"""

from __future__ import annotations

from typing import Optional, Tuple

from flax import linen as nn

from ..nn import (Concurrent, Identity, adaptive_avg_pool2d, conv1x1,
                  conv1x1_block, conv3x3_block, interpolate)
from ..nn.base import Composed
from .registry import register_model
from .resnetd import _LAYERS, resnetd_features

__all__ = ["PSPNet", "PSPFinalBlock", "PyramidPooling", "get_pspnet",
           "segmentation_backbone"]


def segmentation_backbone(blocks: int, bends=(3,), name: str = "backbone"):
    """ResNet(D)-b trunk with a stage-3 tap, as the reference composes it
    (pspnet.py:276-280: ``resnetd{50,101}b(...).features`` minus final
    pool)."""
    from ..nn import MultiOutputSequential, positional_layers
    bottleneck = blocks >= 50
    channels_per_layers = [256, 512, 1024, 2048] if bottleneck else \
        [64, 128, 256, 512]
    layers = _LAYERS[blocks]
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    feats = resnetd_features(channels, 64, bottleneck, conv1_stride=False,
                             ordinary_init=False, bends=bends,
                             final_pool=False, name=name)
    # torch renumbers sliced-backbone children positionally (backbone.0...)
    return MultiOutputSequential(layers=positional_layers(feats.layers),
                                 output_idx=feats.output_idx, name=name)


class PSPFinalBlock(nn.Module):
    """3x3 conv block -> dropout -> 1x1 conv -> bilinear up to out_size
    (reference pspnet.py:19)."""

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


class PyramidPoolingBranch(nn.Module):
    """adaptive pool -> 1x1 conv block -> bilinear up
    (reference pspnet.py:56)."""

    out_channels: int = 0
    pool_out_size: int = 1
    upscale_out_size: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_size = (self.upscale_out_size if self.upscale_out_size is not None
                   else x.shape[1:3])
        x = adaptive_avg_pool2d(self.pool_out_size)(x)
        x = conv1x1_block(out_channels=self.out_channels, name="conv")(
            x, train=train)
        return interpolate(x, in_size, mode="bilinear", align_corners=True)


def PyramidPooling(in_channels: int,
                   upscale_out_size: Optional[Tuple[int, int]],
                   name: str = "pool") -> Concurrent:
    """identity + 4 pooled branches, concat (reference pspnet.py:93)."""
    pool_out_sizes = [1, 2, 3, 6]
    mid_channels = in_channels // 4
    branches = [Identity(name="branch1", parent=None)]
    for i, pool_out_size in enumerate(pool_out_sizes):
        branches.append(PyramidPoolingBranch(
            out_channels=mid_channels, pool_out_size=pool_out_size,
            upscale_out_size=upscale_out_size, name=f"branch{i + 2}",
            parent=None))
    return Concurrent(layers=tuple(branches), name=f"{name}.branches")


class PSPNet(Composed):
    """PSPNet (reference pspnet.py:126)."""

    backbone: object = None
    backbone_out_channels: int = 2048
    aux: bool = False
    fixed_size: bool = True
    in_channels: int = 3
    in_size: Tuple[int, int] = (480, 480)
    num_classes: int = 21

    @nn.compact
    def __call__(self, x, train: bool = False, from_features: bool = False):
        """``from_features=True``: ``x`` is the backbone's output tuple
        (stage4, stage3-bend) — the head-only entry the int8 serving
        pipeline composes with its quantized backbone
        (quant/seg_backbone_int8.py)."""
        assert self.fixed_size or not from_features, \
            "from_features requires fixed_size (static upsample target)"
        in_size = self.in_size if self.fixed_size else x.shape[1:3]
        pool_out_size = ((self.in_size[0] // 8, self.in_size[1] // 8)
                         if self.fixed_size else None)
        outs = x if from_features else \
            self.adopt_call(self.backbone, x, train=train)
        x, y = outs[0], outs[1]  # noqa: F841 (y = stage-3 bend, aux head)
        x = PyramidPooling(self.backbone_out_channels, pool_out_size,
                           name="pool")(x, train=train)
        x = PSPFinalBlock(out_channels=self.num_classes,
                          bottleneck_factor=8, name="final_block")(
                              x, in_size, train=train)
        if self.aux:
            y = PSPFinalBlock(out_channels=self.num_classes,
                              bottleneck_factor=4, name="aux_block")(
                                  y, in_size, train=train)
            return x, y
        return x


def get_pspnet(backbone, backbone_out_channels: int = 2048,
               num_classes: int = 21, aux: bool = False, **kwargs):
    """Builder (reference pspnet.py:209)."""
    return PSPNet(backbone=backbone,
                  backbone_out_channels=backbone_out_channels,
                  num_classes=num_classes, aux=aux, **kwargs)


def _variant(name, blocks, num_classes):
    @register_model(name)
    def ctor(num_classes: int = num_classes, aux: bool = True, **kwargs):
        backbone = segmentation_backbone(blocks)
        return get_pspnet(backbone=backbone, num_classes=num_classes,
                          aux=aux, **kwargs)
    ctor.__name__ = name
    return ctor


pspnet_resnetd50b_voc = _variant("pspnet_resnetd50b_voc", 50, 21)
pspnet_resnetd101b_voc = _variant("pspnet_resnetd101b_voc", 101, 21)
pspnet_resnetd50b_coco = _variant("pspnet_resnetd50b_coco", 50, 21)
pspnet_resnetd101b_coco = _variant("pspnet_resnetd101b_coco", 101, 21)
pspnet_resnetd50b_ade20k = _variant("pspnet_resnetd50b_ade20k", 50, 150)
pspnet_resnetd101b_ade20k = _variant("pspnet_resnetd101b_ade20k", 101, 150)
pspnet_resnetd50b_cityscapes = _variant("pspnet_resnetd50b_cityscapes",
                                        50, 19)
pspnet_resnetd101b_cityscapes = _variant("pspnet_resnetd101b_cityscapes",
                                         101, 19)
