"""CenterNet, TPU-native. Behavioral reference: pytorchcv
``models/centernet.py`` (CenterNetDecoderUnit:18, CenterNetHeadBlock:57,
CenterNetHeatmapBlock:94, CenterNetHeatmapMaxDet:123, CenterNet:185,
get_centernet:265, 6 variants).

The decode is pure tensor work: ``lax.top_k`` over the flattened heatmap +
gathers — exactly the XLA-friendly rewrite SURVEY §3.4 calls for."""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import (Concurrent, DeconvBlock, Sequential, conv1x1,
                  conv3x3_block, max_pool2d, positional_layers)
from ..nn.base import Composed, Held
from .registry import register_model
from .resnet import resnet_features

__all__ = ["CenterNet", "get_centernet", "CenterNetHeatmapMaxDet"]


class CenterNetDecoderUnit(nn.Module):
    """conv + x2 deconv (reference centernet.py:18)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.out_channels, bias=True,
                          name="conv")(x, train=train)
        return DeconvBlock(out_channels=self.out_channels, kernel_size=4,
                           stride=2, padding=1,
                           name="deconv")(x, train=train)


class CenterNetHeadBlock(nn.Module):
    """3x3(no norm) + 1x1 head (reference centernet.py:57)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        x = conv3x3_block(out_channels=in_channels, bias=True,
                          normalization=None, name="conv1")(x, train=train)
        return conv1x1(out_channels=self.out_channels, bias=True,
                       name="conv2")(x)


class CenterNetHeatmapBlock(nn.Module):
    """Head + sigmoid + maxpool-NMS (reference centernet.py:94)."""

    out_channels: int = 0
    do_nms: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = CenterNetHeadBlock(out_channels=self.out_channels,
                               name="head")(x, train=train)
        x = nn.sigmoid(x)
        if self.do_nms:
            y = max_pool2d(3, 1, padding=1)(x)
            x = x * (y == x).astype(x.dtype)
        else:
            eps = 1e-4
            x = jnp.clip(x, eps, 1.0 - eps)
        return x


def centernet_heatmap_max_det(x, topk: int = 40, scale: int = 4):
    """Vectorized top-k decode (reference centernet.py:123-167). Input is
    NHWC [heatmap | wh | reg]; returns (B, topk, 6) boxes
    (x1, y1, x2, y2, class, score)."""
    heatmap = x[..., :-4]
    wh = x[..., -4:-2]
    reg = x[..., -2:]
    batch, out_h, out_w, _ = heatmap.shape
    # torch flattens channel-major: class index = flat // (H*W)
    flat = jnp.transpose(heatmap, (0, 3, 1, 2)).reshape(batch, -1)
    scores, indices = jax.lax.top_k(flat, topk)
    topk_classes = (indices // (out_h * out_w)).astype(jnp.float32)
    topk_indices = indices % (out_h * out_w)
    topk_ys = (topk_indices // out_w).astype(jnp.float32)
    topk_xs = (topk_indices % out_w).astype(jnp.float32)
    center = reg.reshape(batch, -1, 2)
    wh_flat = wh.reshape(batch, -1, 2)
    xs = jnp.take_along_axis(center[:, :, 0], topk_indices, axis=-1)
    ys = jnp.take_along_axis(center[:, :, 1], topk_indices, axis=-1)
    topk_xs = topk_xs + xs
    topk_ys = topk_ys + ys
    w = jnp.take_along_axis(wh_flat[:, :, 0], topk_indices, axis=-1)
    h = jnp.take_along_axis(wh_flat[:, :, 1], topk_indices, axis=-1)
    bboxes = jnp.stack((topk_xs - 0.5 * w, topk_ys - 0.5 * h,
                        topk_xs + 0.5 * w, topk_ys + 0.5 * h), axis=-1)
    bboxes = bboxes * scale
    return jnp.concatenate([bboxes, topk_classes[..., None],
                            scores[..., None]], axis=-1)


class CenterNetHeatmapMaxDet(nn.Module):
    """Module wrapper for the decode (reference centernet.py:123)."""

    topk: int = 40
    scale: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        return centernet_heatmap_max_det(x, self.topk, self.scale)


class CenterNet(Composed):
    """CenterNet (reference centernet.py:185)."""

    backbone: Any = None
    backbone_out_channels: int = 512
    channels: Any = None
    return_heatmap: bool = False
    topk: int = 40
    in_size: Tuple[int, int] = (512, 512)
    in_channels: int = 3
    num_classes: int = 80

    @nn.compact
    def __call__(self, x, train: bool = False, from_features: bool = False):
        """``from_features=True``: ``x`` is the backbone feature map —
        head-only entry for the int8 serving pipeline
        (quant/seg_backbone_int8.py)."""
        if not from_features:
            x = self.adopt_call(self.backbone, x, train=train)
        units = [CenterNetDecoderUnit(out_channels=oc, name=f"unit{i + 1}",
                                      parent=None)
                 for i, oc in enumerate(self.channels)]
        heads = Concurrent(layers=(
            CenterNetHeatmapBlock(out_channels=self.num_classes,
                                  do_nms=(not self.return_heatmap),
                                  name="heapmap_block", parent=None),
            CenterNetHeadBlock(out_channels=2, name="wh_block", parent=None),
            CenterNetHeadBlock(out_channels=2, name="reg_block",
                               parent=None),
        ), name="heads", parent=None)
        x = Sequential(layers=tuple(units) + (heads,),
                       name="decoder")(x, train=train)
        if not self.return_heatmap:
            x = centernet_heatmap_max_det(x, self.topk, scale=4)
        return x


def get_centernet(backbone, backbone_out_channels, num_classes, **kwargs):
    """Config expander (reference centernet.py:265)."""
    return CenterNet(backbone=backbone,
                     backbone_out_channels=backbone_out_channels,
                     channels=[256, 128, 64], num_classes=num_classes,
                     **kwargs)


def _resnet_backbone(blocks: int):
    if blocks == 18:
        channels = [[64, 64], [128, 128], [256, 256], [512, 512]]
        bottleneck, conv1_stride, out_ch = False, True, 512
    elif blocks == 50:
        channels = [[256] * 3, [512] * 4, [1024] * 6, [2048] * 3]
        bottleneck, conv1_stride, out_ch = True, False, 2048
    else:
        channels = [[256] * 3, [512] * 4, [1024] * 23, [2048] * 3]
        bottleneck, conv1_stride, out_ch = True, False, 2048
    feats = resnet_features(channels, 64, bottleneck, conv1_stride,
                            final_pool=False)
    layers = positional_layers(
        [l.module if isinstance(l, Held) else l for l in feats.layers])
    return Sequential(layers=layers, name="backbone", parent=None), out_ch


for _blocks, _tag in [(18, "resnet18"), (50, "resnet50b"),
                      (101, "resnet101b")]:
    for _ds, _nc in [("voc", 20), ("coco", 80)]:
        _name = f"centernet_{_tag}_{_ds}"

        def _make(blocks=_blocks, nc=_nc):
            def ctor(num_classes: int = nc, **kwargs):
                backbone, out_ch = _resnet_backbone(blocks)
                return get_centernet(backbone=backbone,
                                     backbone_out_channels=out_ch,
                                     num_classes=num_classes, **kwargs)
            return ctor
        _ctor = _make()
        _ctor.__name__ = _name
        register_model(_name)(_ctor)
