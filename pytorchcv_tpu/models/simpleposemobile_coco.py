"""SimplePose(Mobile) for COCO Keypoint, TPU-native. Behavioral reference:
pytorchcv ``models/simpleposemobile_coco.py`` (SimplePoseMobile:19,
get_simpleposemobile:120, 6 variants). DUC pixel-shuffle decoder."""

from __future__ import annotations

from typing import Any, Tuple

from flax import linen as nn

from ..nn import (DucBlock, HeatmapMaxDetBlock, Sequential, conv1x1,
                  positional_layers)
from ..nn.base import Composed, Held
from .mobilenet import get_mobilenet
from .mobilenetv2 import get_mobilenetv2
from .mobilenetv3 import get_mobilenetv3
from .registry import register_model
from .resnet import resnet_features
from .shell import ImageClassifier

__all__ = ["SimplePoseMobile", "get_simpleposemobile"]


def sliced_backbone(classifier: ImageClassifier, name: str = "backbone"):
    """``model.features`` minus the final pool, positionally renumbered
    (torch ``del backbone[-1]`` semantics)."""

    def unwrap(m):
        return m.module if isinstance(m, Held) else m

    feats = unwrap(classifier.features)
    layers = [unwrap(l) for l in feats.layers]
    while layers and not isinstance(layers[-1], nn.Module):
        layers.pop()
    return Sequential(layers=positional_layers(layers), name=name,
                      parent=None)


class SimplePoseMobile(Composed):
    """SimplePose(Mobile) (reference simpleposemobile_coco.py:19)."""

    backbone: Any = None
    backbone_out_channels: int = 512
    channels: Any = None
    decoder_init_block_channels: int = 256
    return_heatmap: bool = False
    in_size: Tuple[int, int] = (256, 192)
    in_channels: int = 3
    keypoints: int = 17

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = self.adopt_call(self.backbone, x, train=train)
        decoder = [conv1x1(out_channels=self.decoder_init_block_channels,
                           name="init_block", parent=None)]
        for i, out_channels in enumerate(self.channels):
            decoder.append(DucBlock(out_channels=out_channels,
                                    scale_factor=2, name=f"unit{i + 1}",
                                    parent=None))
        decoder.append(conv1x1(out_channels=self.keypoints,
                               name="final_block", parent=None))
        heatmap = Sequential(layers=tuple(decoder),
                             name="decoder")(x, train=train)
        if self.return_heatmap:
            return heatmap
        return HeatmapMaxDetBlock()(heatmap)


def get_simpleposemobile(backbone, backbone_out_channels, keypoints,
                         **kwargs):
    """Config expander (reference simpleposemobile_coco.py:120)."""
    return SimplePoseMobile(backbone=backbone,
                            backbone_out_channels=backbone_out_channels,
                            channels=[128, 64, 32],
                            decoder_init_block_channels=256,
                            keypoints=keypoints, **kwargs)


def _backbone_factory(kind: str):
    if kind == "resnet18":
        feats = resnet_features([[64, 64], [128, 128], [256, 256],
                                 [512, 512]], 64, False, True,
                                final_pool=False)
        layers = [l.module if isinstance(l, Held) else l
                  for l in feats.layers]
        return Sequential(layers=positional_layers(layers), name="backbone",
                          parent=None), 512
    if kind == "resnet50b":
        feats = resnet_features([[256] * 3, [512] * 4, [1024] * 6,
                                 [2048] * 3], 64, True, False,
                                final_pool=False)
        layers = [l.module if isinstance(l, Held) else l
                  for l in feats.layers]
        return Sequential(layers=positional_layers(layers), name="backbone",
                          parent=None), 2048
    if kind == "mobilenet_w1":
        return sliced_backbone(get_mobilenet(width_scale=1.0)), 1024
    if kind == "mobilenetv2b_w1":
        return sliced_backbone(get_mobilenetv2(width_scale=1.0,
                                               remove_exp_conv=True)), 1280
    if kind == "mobilenetv3_small_w1":
        return sliced_backbone(get_mobilenetv3(version="small",
                                               width_scale=1.0)), 576
    if kind == "mobilenetv3_large_w1":
        return sliced_backbone(get_mobilenetv3(version="large",
                                               width_scale=1.0)), 960
    raise ValueError(kind)


for _kind in ["resnet18", "resnet50b", "mobilenet_w1", "mobilenetv2b_w1",
              "mobilenetv3_small_w1", "mobilenetv3_large_w1"]:
    _name = f"simplepose_mobile_{_kind}_coco"

    def _make(kind=_kind):
        def ctor(keypoints: int = 17, **kwargs):
            backbone, out_ch = _backbone_factory(kind)
            return get_simpleposemobile(backbone=backbone,
                                        backbone_out_channels=out_ch,
                                        keypoints=keypoints, **kwargs)
        return ctor
    _ctor = _make()
    _ctor.__name__ = _name
    register_model(_name)(_ctor)
