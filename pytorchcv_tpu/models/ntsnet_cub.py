"""NTS-Net for CUB-200-2011 fine-grained classification, TPU-native
(JAX/flax, NHWC).

Behavioral reference: pytorchcv ``models/ntsnet_cub.py`` (hard_nms:17,
NavigatorBranch:74, NavigatorUnit:121, NTSNet:152,
_generate_default_anchor_maps:276, get_ntsnet:342, ntsnet_cub:380) from
'Learning to Navigate for Fine-grained Classification'
https://arxiv.org/abs/1809.00287.

The reference runs NMS and part-crop extraction ON HOST (numpy inside
forward). Here both stay on device with static shapes:
- hard-NMS is ``top_n`` unrolled argmax+IoU-mask steps over the fixed
  1614-anchor set (exactly the greedy suppression order);
- each selected part window is resampled to 224x224 with a bilinear
  gather (``grid_sample``-style) over the padded image, reproducing
  torch's variable-size crop + ``interpolate(align_corners=True)``.
"""

from __future__ import annotations

from typing import Any, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import conv1x1, conv3x3
from ..nn.base import Composed, dense_kernel_init
from .registry import register_model
from .resnet import resnet_features

__all__ = ["NTSNet", "get_ntsnet"]


def _generate_default_anchor_maps(input_shape=(448, 448)):
    """Static anchor set (reference ntsnet_cub.py:276)."""
    anchor_scale = [2 ** (1.0 / 3.0), 2 ** (2.0 / 3.0)]
    anchor_aspect_ratio = [0.667, 1, 1.5]
    anchors_setting = (
        dict(stride=32, size=48, scale=anchor_scale,
             aspect_ratio=anchor_aspect_ratio),
        dict(stride=64, size=96, scale=anchor_scale,
             aspect_ratio=anchor_aspect_ratio),
        dict(stride=128, size=192,
             scale=[1, anchor_scale[0], anchor_scale[1]],
             aspect_ratio=anchor_aspect_ratio),
    )
    edge_anchors = np.zeros((0, 4), dtype=np.float32)
    input_shape = np.array(input_shape, dtype=int)
    for info in anchors_setting:
        stride, size = info["stride"], info["size"]
        out_shape = tuple(np.ceil(input_shape.astype(np.float32) /
                                  stride).astype(int)) + (4,)
        ostart = stride / 2.0
        oy = np.arange(ostart, ostart + stride * out_shape[0],
                       stride).reshape(out_shape[0], 1)
        ox = np.arange(ostart, ostart + stride * out_shape[1],
                       stride).reshape(1, out_shape[1])
        template = np.zeros(out_shape, dtype=np.float32)
        template[:, :, 0] = oy
        template[:, :, 1] = ox
        for s in info["scale"]:
            for ar in info["aspect_ratio"]:
                m = template.copy()
                m[:, :, 2] = size * s / float(ar) ** 0.5
                m[:, :, 3] = size * s * float(ar) ** 0.5
                edge = np.concatenate((m[:, :, :2] - m[:, :, 2:4] / 2.0,
                                       m[:, :, :2] + m[:, :, 2:4] / 2.0),
                                      axis=-1)
                edge_anchors = np.concatenate(
                    (edge_anchors, edge.reshape(-1, 4)))
    return edge_anchors


def hard_nms_jax(scores, anchors, top_n: int, iou_thresh: float = 0.25):
    """Greedy NMS as ``top_n`` argmax+mask steps (reference hard_nms:17).
    ``scores``: (A,); ``anchors``: (A, 4) int (y0, x0, y1, x1).
    Returns indices (top_n,)."""
    areas = (anchors[:, 2] - anchors[:, 0]) * \
        (anchors[:, 3] - anchors[:, 1])
    active = jnp.ones(scores.shape, dtype=bool)
    picked = []
    for _ in range(top_n):
        idx = jnp.argmax(jnp.where(active, scores, -jnp.inf))
        picked.append(idx)
        cdd = anchors[idx]
        start_max = jnp.maximum(anchors[:, :2], cdd[:2])
        end_min = jnp.minimum(anchors[:, 2:], cdd[2:])
        lengths = end_min - start_max
        inter = jnp.where((lengths[:, 0] < 0) | (lengths[:, 1] < 0), 0,
                          lengths[:, 0] * lengths[:, 1])
        iou = inter / (areas + areas[idx] - inter)
        active = active & (iou < iou_thresh)
    return jnp.stack(picked)


def _crop_resize(x_pad, box, out_size: int = 224):
    """Bilinear resample of an integer box to (out, out) — equals torch's
    crop + interpolate(align_corners=True) (reference NTSNet.forward:241).
    ``x_pad``: (H, W, C); ``box``: (4,) int (y0, x0, y1, x1)."""
    y0, x0, y1, x1 = box[0], box[1], box[2], box[3]
    h = (y1 - y0).astype(jnp.float32)
    w = (x1 - x0).astype(jnp.float32)
    t = jnp.arange(out_size, dtype=jnp.float32) / (out_size - 1)
    ys = y0.astype(jnp.float32) + t * (h - 1.0)
    xs = x0.astype(jnp.float32) + t * (w - 1.0)
    yf = jnp.floor(ys)
    xf = jnp.floor(xs)
    wy = (ys - yf)[:, None, None]
    wx = (xs - xf)[None, :, None]
    H, W = x_pad.shape[0], x_pad.shape[1]
    y0i = jnp.clip(yf.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    x0i = jnp.clip(xf.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    top = x_pad[y0i][:, x0i] * (1 - wx) + x_pad[y0i][:, x1i] * wx
    bot = x_pad[y1i][:, x0i] * (1 - wx) + x_pad[y1i][:, x1i] * wx
    return top * (1 - wy) + bot * wy


class NavigatorBranch(nn.Module):
    """3x3 down conv + 1x1 tidy conv (reference ntsnet_cub.py:74)."""

    out_channels: int = 6
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        mid_channels = 128
        y = conv3x3(out_channels=mid_channels, stride=self.stride,
                    bias=True, name="down_conv")(x)
        y = nn.relu(y)
        z = conv1x1(out_channels=self.out_channels, bias=True,
                    name="tidy_conv")(y)
        # torch Flatten uses NCHW order
        z = z.transpose(0, 3, 1, 2).reshape(z.shape[0], -1)
        return z, y


class NavigatorUnit(nn.Module):
    """Three-scale navigator (reference ntsnet_cub.py:121)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        t1, x = NavigatorBranch(out_channels=6, stride=1, name="branch1")(
            x, train=train)
        t2, x = NavigatorBranch(out_channels=6, stride=2, name="branch2")(
            x, train=train)
        t3, _ = NavigatorBranch(out_channels=9, stride=2, name="branch3")(
            x, train=train)
        return jnp.concatenate([t1, t2, t3], axis=1)


class NTSNet(Composed):
    """NTS-Net (reference ntsnet_cub.py:152)."""

    backbone: Any = None
    aux: bool = False
    top_n: int = 4
    in_channels: int = 3
    in_size: Tuple[int, int] = (448, 448)
    num_classes: int = 200

    @nn.compact
    def __call__(self, x, train: bool = False):
        num_cat = 4
        pad_side = 224
        edge_anchors = (_generate_default_anchor_maps() + 224).astype(int)
        anchors = jnp.asarray(edge_anchors, jnp.int32)

        backbone = self.adopt(self.backbone)
        raw_pre_features = backbone(x, train=train)

        rpn_score = NavigatorUnit(name="navigator_unit")(
            raw_pre_features, train=train)
        scores = jax.lax.stop_gradient(rpn_score)
        top_n_index = jax.vmap(
            lambda s: hard_nms_jax(s, anchors, self.top_n))(scores)
        top_n_prob = jnp.take_along_axis(rpn_score, top_n_index, axis=1)

        x_pad = jnp.pad(x, ((0, 0), (pad_side, pad_side),
                            (pad_side, pad_side), (0, 0)))
        boxes = anchors[top_n_index]  # (B, top_n, 4)

        def crops_for_sample(img, bxs):
            return jax.vmap(lambda b: _crop_resize(img, b))(bxs)

        part_imgs = jax.vmap(crops_for_sample)(x_pad, boxes)
        batch = x.shape[0]
        part_imgs = part_imgs.reshape(batch * self.top_n, 224, 224,
                                      self.in_channels)

        def tail(feats):
            pooled = jnp.mean(feats, axis=(1, 2))
            return nn.Dropout(rate=0.5, deterministic=not train)(pooled)

        part_features = tail(backbone(
            jax.lax.stop_gradient(part_imgs), train=train))
        part_feature = part_features.reshape(batch, self.top_n, -1)
        part_feature = part_feature[:, :num_cat, :].reshape(batch, -1)

        raw_features = tail(jax.lax.stop_gradient(raw_pre_features))
        concat_out = jnp.concatenate([part_feature, raw_features], axis=1)
        concat_logits = nn.Dense(self.num_classes,
                                 kernel_init=dense_kernel_init,
                                 name="concat_net")(concat_out)
        # the reference builds backbone_classifier unconditionally
        # (ntsnet_cub.py:194); materialize it so aux=False checkpoints map
        raw_logits = nn.Dense(self.num_classes,
                              kernel_init=dense_kernel_init,
                              name="backbone_classifier")(raw_features)
        if self.aux:
            part_logits = nn.Dense(self.num_classes,
                                   kernel_init=dense_kernel_init,
                                   name="partcls_net")(
                part_features).reshape(batch, self.top_n, -1)
            return concat_logits, raw_logits, part_logits, top_n_prob
        return concat_logits


def get_ntsnet(aux: bool = False, **kwargs) -> NTSNet:
    """Config expander (reference ntsnet_cub.py:342). The backbone is
    resnet50b's feature trunk without the final pool. NB: the reference's
    ``del backbone[-1]`` re-indexes the Sequential, so checkpoint scopes
    are numeric (backbone.0 .. backbone.4)."""
    from ..nn import Sequential
    from .resnet import ResInitBlock, ResUnit
    channels = [[256] * 3, [512] * 4, [1024] * 6, [2048] * 3]
    layers = [ResInitBlock(out_channels=64, name="0", parent=None)]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(ResUnit(out_channels=out_channels, stride=stride,
                                 bottleneck=True, conv1_stride=False,
                                 name=f"unit{j + 1}", parent=None))
        layers.append(Sequential(layers=tuple(units), name=str(i + 1),
                                 parent=None))
    backbone = Sequential(layers=tuple(layers), name="backbone",
                          parent=None)
    return NTSNet(backbone=backbone, aux=aux, **kwargs)


@register_model("ntsnet_cub")
def ntsnet_cub(aux: bool = True, **kwargs):
    return get_ntsnet(aux=aux, **kwargs)
