"""ICNet, TPU-native. Behavioral reference: pytorchcv ``models/icnet.py``
(ICInitBlock:15, PSPBlock:56, CFFBlock:97, ICHeadBlock:151, ICNet:199,
icnet_resnetd50b_cityscapes:303). Three-resolution cascade sharing the
ResNet(D)-50b trunk split in two."""

from __future__ import annotations

from typing import Any, Optional, Tuple

from flax import linen as nn

from ..nn import (InterpolationBlock, MultiOutputSequential, Sequential,
                  conv1x1, conv1x1_block, conv3x3_block, positional_layers)
from ..nn.base import Composed, Held
from .pspnet import PyramidPooling
from .registry import register_model
from .resnetd import _LAYERS, resnetd_features

__all__ = ["ICNet", "get_icnet"]


class ICInitBlock(nn.Module):
    """Three strided 3x3 blocks (reference icnet.py:15)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = self.out_channels // 2
        x = conv3x3_block(out_channels=mid_channels, stride=2,
                          name="conv1")(x, train=train)
        x = conv3x3_block(out_channels=mid_channels, stride=2,
                          name="conv2")(x, train=train)
        return conv3x3_block(out_channels=self.out_channels, stride=2,
                             name="conv3")(x, train=train)


class PSPBlock(nn.Module):
    """Reduced PSP head (reference icnet.py:56)."""

    upscale_out_size: Optional[Tuple[int, int]] = None
    bottleneck_factor: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = x.shape[-1] // self.bottleneck_factor
        x = PyramidPooling(in_channels=x.shape[-1],
                           upscale_out_size=self.upscale_out_size,
                           name="pool")(x, train=train)
        x = conv3x3_block(out_channels=mid_channels,
                          name="conv")(x, train=train)
        if train:
            x = nn.Dropout(rate=0.1, deterministic=False)(x)
        return x


class CFFBlock(nn.Module):
    """Cascade feature fusion (reference icnet.py:97)."""

    out_channels: int = 128
    num_classes: int = 19

    @nn.compact
    def __call__(self, xl, xh, train: bool = False):
        xl = InterpolationBlock()(xl, size=(2 * xl.shape[1],
                                            2 * xl.shape[2]))
        xl = conv3x3_block(out_channels=self.out_channels, padding=2,
                           dilation=2, activation=None,
                           name="conv_low")(xl, train=train)
        xh = conv1x1_block(out_channels=self.out_channels, activation=None,
                           name="conv_hign")(xh, train=train)
        x = nn.relu(xl + xh)
        x_cls = conv1x1(out_channels=self.num_classes, name="conv_cls")(xl)
        return x, x_cls


class ICHeadBlock(nn.Module):
    """Cascade head (reference icnet.py:151)."""

    num_classes: int = 19

    @nn.compact
    def __call__(self, x1, x2, x4, train: bool = False):
        outputs = []
        x_cff_24, x_24_cls = CFFBlock(out_channels=128,
                                      num_classes=self.num_classes,
                                      name="cff_24")(x4, x2, train=train)
        outputs.append(x_24_cls)
        x_cff_12, x_12_cls = CFFBlock(out_channels=128,
                                      num_classes=self.num_classes,
                                      name="cff_12")(x_cff_24, x1,
                                                     train=train)
        outputs.append(x_12_cls)
        up_x2 = InterpolationBlock()(x_cff_12, size=(2 * x_cff_12.shape[1],
                                                     2 * x_cff_12.shape[2]))
        up_x2 = conv1x1(out_channels=self.num_classes, name="conv_cls")(up_x2)
        outputs.append(up_x2)
        up_x8 = InterpolationBlock()(up_x2, size=(4 * up_x2.shape[1],
                                                  4 * up_x2.shape[2]))
        outputs.append(up_x8)
        outputs.reverse()
        return tuple(outputs)


class ICNet(Composed):
    """ICNet (reference icnet.py:199)."""

    backbone1: Any = None
    backbone2: Any = None
    backbones_out_channels: Tuple = (512, 2048)
    channels: Tuple = (64, 256, 256)
    aux: bool = False
    fixed_size: bool = True
    in_size: Tuple[int, int] = (480, 480)
    in_channels: int = 3
    num_classes: int = 21

    @nn.compact
    def __call__(self, x, train: bool = False):
        psp_pool_out_size = (self.in_size[0] // 32, self.in_size[1] // 32) \
            if self.fixed_size else None
        y1 = ICInitBlock(out_channels=self.channels[0],
                         name="branch1")(x, train=train)
        y3, y2_raw = ICBranch2(backbone1=self.backbone1,
                               backbone2=self.backbone2,
                               out_channels=self.channels[2],
                               psp_pool_out_size=psp_pool_out_size,
                               name="branch2")(x, train=train)
        y2 = conv1x1_block(out_channels=self.channels[1],
                           name="conv_y2")(y2_raw, train=train)
        out = ICHeadBlock(num_classes=self.num_classes,
                          name="final_block")(y1, y2, y3, train=train)
        if self.aux:
            return out
        return out[0]


class ICBranch2(Composed):
    """Low-resolution branch: down -> trunk-a -> down -> trunk-b -> PSP
    (torch ``branch2`` MultiOutputSequential, reference icnet.py:252-266)."""

    backbone1: Any = None
    backbone2: Any = None
    out_channels: int = 256
    psp_pool_out_size: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        down = InterpolationBlock(up=False)
        z = down(x, size=(x.shape[1] // 2, x.shape[2] // 2))
        y2 = self.adopt_call(self.backbone1, z, train=train)
        z = down(y2, size=(y2.shape[1] // 2, y2.shape[2] // 2))
        z = self.adopt_call(self.backbone2, z, train=train)
        z = PSPBlock(upscale_out_size=self.psp_pool_out_size,
                     bottleneck_factor=4, name="psp")(z, train=train)
        y3 = conv1x1_block(out_channels=self.out_channels,
                           name="final_block")(z, train=train)
        return y3, y2


def get_icnet(backbone1, backbone2, backbones_out_channels, num_classes,
              aux=False, **kwargs):
    """Config expander (reference icnet.py:242)."""
    return ICNet(backbone1=backbone1, backbone2=backbone2,
                 backbones_out_channels=tuple(backbones_out_channels),
                 channels=(64, 256, 256), num_classes=num_classes, aux=aux,
                 **kwargs)


@register_model("icnet_resnetd50b_cityscapes")
def icnet_resnetd50b_cityscapes(num_classes: int = 19, aux: bool = True,
                                **kwargs):
    # ResNet(D)-50b trunk split: [init, stage1, stage2] / [stage3, stage4]
    # (reference icnet.py:303-327)
    bottleneck = True
    channels = [[256] * 3, [512] * 4, [1024] * 6, [2048] * 3]
    feats = resnetd_features(channels, 64, bottleneck, conv1_stride=False,
                             ordinary_init=False, bends=None,
                             final_pool=False)

    def unwrap(m):
        return m.module if isinstance(m, Held) else m

    layers = [unwrap(l) for l in feats.layers]
    backbone1 = Sequential(layers=positional_layers(layers[:3]),
                           name="backbones1", parent=None)
    backbone2 = Sequential(layers=positional_layers(layers[3:5]),
                           name="backbones2", parent=None)
    return get_icnet(backbone1=backbone1, backbone2=backbone2,
                     backbones_out_channels=(512, 2048),
                     num_classes=num_classes, aux=aux, **kwargs)
