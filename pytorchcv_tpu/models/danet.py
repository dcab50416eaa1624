"""DANet, TPU-native. Behavioral reference: pytorchcv ``models/danet.py``
(ScaleBlock:15, PosAttBlock:44, ChaAttBlock:99, DANetHeadBranch:140,
DANetHead:191, DANet:238, danet_resnetd50b_cityscapes:315).

The position/channel attentions are true QK^T matmuls over H*W — MXU work;
NHWC layout reshapes to (B, HW, C) directly."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import InterpolationBlock, conv1x1, conv3x3_block
from ..nn.base import Composed
from .pspnet import segmentation_backbone
from .registry import register_model

__all__ = ["DANet", "get_danet", "ScaleBlock"]


class ScaleBlock(nn.Module):
    """Learnable scalar gain (reference danet.py:15)."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.zeros, (1,))
        return alpha * x


class PosAttBlock(nn.Module):
    """Position self-attention over H*W (reference danet.py:44)."""

    channels: int = 0
    reduction: int = 8

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        mid = self.channels // self.reduction
        q = conv1x1(out_channels=mid, bias=True, name="query_conv")(x)
        k = conv1x1(out_channels=mid, bias=True, name="key_conv")(x)
        v = conv1x1(out_channels=c, bias=True, name="value_conv")(x)
        q = q.reshape(b, h * w, mid)
        k = k.reshape(b, h * w, mid)
        v = v.reshape(b, h * w, c)
        # softmax(q k^T) v without materializing the (HW, HW) score matrix
        # (~51 MB/image at the 480x480 protocol): flash-attention Pallas
        # kernel on TPU at large L, einsum elsewhere (kernels/flash_attention).
        from ..kernels.flash_attention import flash_attention
        y = flash_attention(q, k, v, 1.0)
        y = y.astype(x.dtype).reshape(b, h, w, c)
        return ScaleBlock(name="scale")(y) + x


class ChaAttBlock(nn.Module):
    """Channel gram self-attention (reference danet.py:99)."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        f = x.reshape(b, h * w, c)
        energy = jnp.einsum("bnc,bnd->bcd", f, f)
        energy_new = energy.max(axis=-1, keepdims=True) - energy
        wgt = nn.softmax(energy_new, axis=-1)
        y = jnp.einsum("bcd,bnd->bnc", wgt, f)
        y = y.reshape(b, h, w, c)
        return ScaleBlock(name="scale")(y) + x


class DANetHeadBranch(nn.Module):
    """conv -> attention -> conv -> classifier
    (reference danet.py:140)."""

    out_channels: int = 0
    pose_att: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = x.shape[-1] // 4
        x = conv3x3_block(out_channels=mid_channels,
                          name="conv1")(x, train=train)
        if self.pose_att:
            x = PosAttBlock(channels=mid_channels, name="att")(x)
        else:
            x = ChaAttBlock(name="att")(x)
        y = conv3x3_block(out_channels=mid_channels,
                          name="conv2")(x, train=train)
        x = conv1x1(out_channels=self.out_channels, bias=True,
                    name="conv3")(y)
        if train:
            x = nn.Dropout(rate=0.1, deterministic=False)(x)
        return x, y


class DANetHead(nn.Module):
    """Dual-branch head (reference danet.py:191)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        pa_x, pa_y = DANetHeadBranch(out_channels=self.out_channels,
                                     pose_att=True,
                                     name="branch_pa")(x, train=train)
        ca_x, ca_y = DANetHeadBranch(out_channels=self.out_channels,
                                     pose_att=False,
                                     name="branch_ca")(x, train=train)
        y = pa_y + ca_y
        out = conv1x1(out_channels=self.out_channels, bias=True,
                      name="conv")(y)
        if train:
            out = nn.Dropout(rate=0.1, deterministic=False)(out)
        return out, pa_x, ca_x


class DANet(Composed):
    """DANet (reference danet.py:238)."""

    backbone: Any = None
    backbone_out_channels: int = 2048
    aux: bool = False
    fixed_size: bool = True
    in_size: Tuple[int, int] = (480, 480)
    in_channels: int = 3
    num_classes: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False, from_features: bool = False):
        """``from_features=True``: ``x`` is the backbone output tuple —
        head-only entry for the int8 serving pipeline
        (quant/seg_backbone_int8.py)."""
        assert self.fixed_size or not from_features, \
            "from_features requires fixed_size (static upsample target)"
        in_size = self.in_size if self.fixed_size else x.shape[1:3]
        outs = x if from_features else \
            self.adopt_call(self.backbone, x, train=train)
        x = outs[0]
        x, y, z = DANetHead(out_channels=self.num_classes,
                            name="head")(x, train=train)
        up = InterpolationBlock(align_corners=True)
        x = up(x, size=in_size)
        if self.aux:
            y = up(y, size=in_size)
            z = up(z, size=in_size)
            return x, y, z
        return x


def get_danet(backbone, num_classes: int, aux: bool = False, **kwargs):
    """Config expander (reference danet.py:290)."""
    return DANet(backbone=backbone, num_classes=num_classes, aux=aux,
                 **kwargs)


@register_model("danet_resnetd50b_cityscapes")
def danet_resnetd50b_cityscapes(num_classes: int = 19, aux: bool = True,
                                **kwargs):
    backbone = segmentation_backbone(50, bends=(3,))
    return get_danet(backbone=backbone, num_classes=num_classes, aux=aux,
                     **kwargs)


@register_model("danet_resnetd101b_cityscapes")
def danet_resnetd101b_cityscapes(num_classes: int = 19, aux: bool = True,
                                 **kwargs):
    backbone = segmentation_backbone(101, bends=(3,))
    return get_danet(backbone=backbone, num_classes=num_classes, aux=aux,
                     **kwargs)
