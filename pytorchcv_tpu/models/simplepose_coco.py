"""SimplePose (COCO keypoints), TPU-native. Behavioral reference: pytorchcv
``models/simplepose_coco.py`` (SimplePose:19, get_simplepose:92,
variants :143+). Backbone trunk + 3 deconv blocks + 1x1 heatmap head;
keypoint decode is the fully vectorized ``HeatmapMaxDetBlock``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from flax import linen as nn

from ..nn import DeconvBlock, HeatmapMaxDetBlock, Sequential, conv1x1
from ..nn.base import Composed
from .registry import register_model
from .resnet import resnet_features
from .resneta import resneta_features

__all__ = ["SimplePose", "get_simplepose"]


class SimplePose(Composed):
    """SimplePose (reference simplepose_coco.py:19)."""

    backbone: object = None
    backbone_out_channels: int = 2048
    channels: Sequence[int] = (256, 256, 256)
    return_heatmap: bool = False
    in_channels: int = 3
    in_size: Tuple[int, int] = (256, 192)
    keypoints: int = 17

    @property
    def num_classes(self):  # registry shape checks
        return self.keypoints

    @nn.compact
    def __call__(self, x, train: bool = False, from_features: bool = False):
        """``from_features=True``: ``x`` is the backbone feature map —
        head-only entry for the int8 serving pipeline
        (quant/seg_backbone_int8.py)."""
        if not from_features:
            x = self.adopt_call(self.backbone, x, train=train)
        units = [DeconvBlock(out_channels=c, kernel_size=4, stride=2,
                             padding=1, name=f"unit{i + 1}", parent=None)
                 for i, c in enumerate(self.channels)]
        units.append(conv1x1(out_channels=self.keypoints, bias=True,
                             name="final_block", parent=None))
        heatmap = Sequential(layers=tuple(units), name="decoder")(
            x, train=train)
        if self.return_heatmap:
            return heatmap
        return HeatmapMaxDetBlock(name="heatmap_max_det")(heatmap)


def get_simplepose(backbone, backbone_out_channels: int, keypoints: int,
                   **kwargs):
    """Builder (reference simplepose_coco.py:92)."""
    return SimplePose(backbone=backbone,
                      backbone_out_channels=backbone_out_channels,
                      channels=(256, 256, 256), keypoints=keypoints,
                      **kwargs)


def _resnet_backbone(blocks: int, conv1_stride: bool):
    channels_per_layers = [256, 512, 1024, 2048] if blocks >= 50 else \
        [64, 128, 256, 512]
    layer_table = {18: [2, 2, 2, 2], 50: [3, 4, 6, 3], 101: [3, 4, 23, 3],
                   152: [3, 8, 36, 3]}
    layers = layer_table[blocks]
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    return resnet_features(channels, 64, blocks >= 50, conv1_stride,
                           final_pool=False)


def _resneta_backbone(blocks: int):
    layer_table = {50: [3, 4, 6, 3], 101: [3, 4, 23, 3], 152: [3, 8, 36, 3]}
    layers = layer_table[blocks]
    channels = [[ci * 4] * li for ci, li in
                zip([64, 128, 256, 512], layers)]
    return resneta_features(channels, 64, True, False, final_pool=False)


def _variant(name, kind, blocks, out_channels):
    @register_model(name)
    def ctor(keypoints: int = 17, **kwargs):
        from ..nn import positional_layers
        if kind == "resnet":
            backbone = _resnet_backbone(blocks,
                                        conv1_stride=(blocks == 18))
        else:
            backbone = _resneta_backbone(blocks)
        # torch renumbers sliced-backbone children positionally
        backbone = Sequential(layers=positional_layers(backbone.layers),
                              name="backbone")
        return get_simplepose(backbone=backbone,
                              backbone_out_channels=out_channels,
                              keypoints=keypoints, **kwargs)
    ctor.__name__ = name
    return ctor


simplepose_resnet18_coco = _variant("simplepose_resnet18_coco", "resnet",
                                    18, 512)
simplepose_resnet50b_coco = _variant("simplepose_resnet50b_coco", "resnet",
                                     50, 2048)
simplepose_resnet101b_coco = _variant("simplepose_resnet101b_coco",
                                      "resnet", 101, 2048)
simplepose_resnet152b_coco = _variant("simplepose_resnet152b_coco",
                                      "resnet", 152, 2048)
simplepose_resneta50b_coco = _variant("simplepose_resneta50b_coco",
                                      "resneta", 50, 2048)
simplepose_resneta101b_coco = _variant("simplepose_resneta101b_coco",
                                       "resneta", 101, 2048)
simplepose_resneta152b_coco = _variant("simplepose_resneta152b_coco",
                                       "resneta", 152, 2048)
