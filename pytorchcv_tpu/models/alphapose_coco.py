"""AlphaPose for COCO Keypoint, TPU-native. Behavioral reference: pytorchcv
``models/alphapose_coco.py`` (AlphaPose:15, get_alphapose:108,
alphapose_fastseresnet101b_coco:151). PixelShuffle + DUC decoder."""

from __future__ import annotations

from typing import Any, Tuple

from flax import linen as nn

from ..nn import (DucBlock, HeatmapMaxDetBlock, Sequential, conv3x3,
                  pixel_shuffle, positional_layers)
from ..nn.base import Composed, Held
from .fastseresnet import fastseresnet_features
from .registry import register_model

__all__ = ["AlphaPose", "get_alphapose"]


class AlphaPose(Composed):
    """AlphaPose (reference alphapose_coco.py:15)."""

    backbone: Any = None
    backbone_out_channels: int = 2048
    channels: Any = None
    return_heatmap: bool = False
    in_size: Tuple[int, int] = (256, 192)
    in_channels: int = 3
    keypoints: int = 17

    @nn.compact
    def __call__(self, x, train: bool = False, from_features: bool = False):
        """``from_features=True``: ``x`` is the backbone feature map —
        head-only entry for the int8 serving pipeline
        (quant/seg_backbone_int8.py)."""
        if not from_features:
            x = self.adopt_call(self.backbone, x, train=train)
        decoder = [lambda t: pixel_shuffle(t, 2)]
        for i, out_channels in enumerate(self.channels):
            decoder.append(DucBlock(out_channels=out_channels,
                                    scale_factor=2, name=f"unit{i + 1}",
                                    parent=None))
        decoder.append(conv3x3(out_channels=self.keypoints, bias=True,
                               name="final_block", parent=None))
        heatmap = Sequential(layers=tuple(decoder),
                             name="decoder")(x, train=train)
        if self.return_heatmap:
            return heatmap
        return HeatmapMaxDetBlock()(heatmap)


def get_alphapose(backbone, backbone_out_channels, keypoints, **kwargs):
    """Config expander (reference alphapose_coco.py:108)."""
    return AlphaPose(backbone=backbone,
                     backbone_out_channels=backbone_out_channels,
                     channels=[256, 128], keypoints=keypoints, **kwargs)


@register_model("alphapose_fastseresnet101b_coco")
def alphapose_fastseresnet101b_coco(keypoints: int = 17, **kwargs):
    feats = fastseresnet_features(
        [[256] * 3, [512] * 4, [1024] * 23, [2048] * 3], 64, True,
        conv1_stride=False, final_pool=False)
    layers = [l.module if isinstance(l, Held) else l for l in feats.layers]
    backbone = Sequential(layers=positional_layers(layers), name="backbone",
                          parent=None)
    return get_alphapose(backbone=backbone, backbone_out_channels=2048,
                         keypoints=keypoints, **kwargs)
