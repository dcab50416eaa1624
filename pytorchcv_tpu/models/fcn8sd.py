"""FCN-8s(d), TPU-native. Behavioral reference: pytorchcv
``models/fcn8sd.py`` (FCNFinalBlock:15, FCN8sd:53, variants :171+)."""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import conv1x1, conv3x3_block, interpolate
from ..nn.base import Composed
from .pspnet import segmentation_backbone
from .registry import register_model

__all__ = ["FCN8sd", "get_fcn8sd"]


class FCNFinalBlock(nn.Module):
    """3x3 conv block -> dropout -> 1x1 conv -> bilinear up
    (reference fcn8sd.py:15)."""

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


class FCN8sd(Composed):
    """FCN-8s(d) (reference fcn8sd.py:53)."""

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
        outs = x if from_features else \
            self.adopt_call(self.backbone, x, train=train)
        x, y = outs[0], outs[1]
        x = FCNFinalBlock(out_channels=self.num_classes,
                          name="final_block")(x, in_size, train=train)
        if self.aux:
            y = FCNFinalBlock(out_channels=self.num_classes,
                              name="aux_block")(y, in_size, train=train)
            return x, y
        return x


def get_fcn8sd(backbone, backbone_out_channels: int = 2048,
               num_classes: int = 21, aux: bool = False, **kwargs):
    return FCN8sd(backbone=backbone,
                  backbone_out_channels=backbone_out_channels,
                  num_classes=num_classes, aux=aux, **kwargs)


def _variant(name, blocks, num_classes):
    @register_model(name)
    def ctor(num_classes: int = num_classes, aux: bool = True, **kwargs):
        backbone = segmentation_backbone(blocks)
        return get_fcn8sd(backbone=backbone, num_classes=num_classes,
                          aux=aux, **kwargs)
    ctor.__name__ = name
    return ctor


fcn8sd_resnetd50b_voc = _variant("fcn8sd_resnetd50b_voc", 50, 21)
fcn8sd_resnetd101b_voc = _variant("fcn8sd_resnetd101b_voc", 101, 21)
fcn8sd_resnetd50b_coco = _variant("fcn8sd_resnetd50b_coco", 50, 21)
fcn8sd_resnetd101b_coco = _variant("fcn8sd_resnetd101b_coco", 101, 21)
fcn8sd_resnetd50b_ade20k = _variant("fcn8sd_resnetd50b_ade20k", 50, 150)
fcn8sd_resnetd101b_ade20k = _variant("fcn8sd_resnetd101b_ade20k", 101, 150)
fcn8sd_resnetd50b_cityscapes = _variant("fcn8sd_resnetd50b_cityscapes",
                                        50, 19)
fcn8sd_resnetd101b_cityscapes = _variant("fcn8sd_resnetd101b_cityscapes",
                                         101, 19)
