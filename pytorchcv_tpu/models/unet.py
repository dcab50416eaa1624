"""U-Net, TPU-native. Behavioral reference: pytorchcv ``models/unet.py``
(UNetBlock:14, UNetDownStage:48, UNetUpStage:81, UNetHead:114, UNet:149,
get_unet:235)."""

from __future__ import annotations

from typing import Any, Tuple

from flax import linen as nn

from ..nn import (Hourglass, Identity, InterpolationBlock, conv1x1,
                  conv3x3_block, max_pool2d)
from ..nn.base import Composed
from .registry import register_model

__all__ = ["UNet", "get_unet"]


class UNetBlock(nn.Module):
    """Double 3x3 conv (reference unet.py:14)."""

    out_channels: int = 0
    bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.out_channels, bias=self.bias,
                          name="conv1")(x, train=train)
        return conv3x3_block(out_channels=self.out_channels, bias=self.bias,
                             name="conv2")(x, train=train)


class UNetDownStage(nn.Module):
    """Pool + double conv (reference unet.py:48)."""

    out_channels: int = 0
    bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = max_pool2d(2, 2)(x)
        return UNetBlock(out_channels=self.out_channels, bias=self.bias,
                         name="conv")(x, train=train)


class UNetUpStage(nn.Module):
    """Double conv + x2 upsample (reference unet.py:81)."""

    out_channels: int = 0
    bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = UNetBlock(out_channels=self.out_channels, bias=self.bias,
                      name="conv")(x, train=train)
        return InterpolationBlock(scale_factor=2, align_corners=True)(
            x, size=(2 * x.shape[1], 2 * x.shape[2]))


class UNetHead(nn.Module):
    """Double conv + 1x1 classifier (reference unet.py:114)."""

    num_classes: int = 19
    bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = x.shape[-1] // 2
        x = UNetBlock(out_channels=mid_channels, bias=self.bias,
                      name="conv1")(x, train=train)
        return conv1x1(out_channels=self.num_classes, bias=True,
                       name="conv2")(x)


class UNet(Composed):
    """U-Net (reference unet.py:149)."""

    channels: Any = None
    init_block_channels: int = 64
    aux: bool = False
    fixed_size: bool = False
    in_size: Tuple[int, int] = (1024, 2048)
    in_channels: int = 3
    num_classes: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        bias = True
        x = UNetBlock(out_channels=self.init_block_channels, bias=bias,
                      name="stem")(x, train=train)
        down_seq = tuple(
            UNetDownStage(out_channels=oc, bias=bias, name=f"down{i + 1}",
                          parent=None)
            for i, oc in enumerate(self.channels[0]))
        skip_seq = tuple(Identity() for _ in self.channels[0])
        ups = []
        for i, oc in enumerate(self.channels[1]):
            if i == 0:
                ups.append(InterpolationBlock(scale_factor=2,
                                              align_corners=True,
                                              name=f"up{i + 1}",
                                              parent=None))
            else:
                ups.append(UNetUpStage(out_channels=oc, bias=bias,
                                       name=f"up{i + 1}", parent=None))
        up_seq = tuple(ups[::-1])
        x = Hourglass(down_seq=down_seq, up_seq=up_seq, skip_seq=skip_seq,
                      merge_type="cat", name="hg")(x, train=train)
        return UNetHead(num_classes=self.num_classes, bias=bias,
                        name="head")(x, train=train)


def get_unet(**kwargs):
    """Config expander (reference unet.py:235)."""
    channels = [[128, 256, 512, 512], [512, 256, 128, 64]]
    return UNet(channels=channels, init_block_channels=64, **kwargs)


@register_model("unet_cityscapes")
def unet_cityscapes(num_classes: int = 19, **kwargs):
    return get_unet(num_classes=num_classes, **kwargs)
