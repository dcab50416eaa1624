"""SegNet, TPU-native. Behavioral reference: pytorchcv ``models/segnet.py``
(SegNet:13, get_segnet:137). Encoder pool indices feed the decoder's
unpooling stages."""

from __future__ import annotations

from typing import Any, Tuple

from flax import linen as nn

from ..nn import (conv3x3, conv3x3_block, max_pool2d_with_indices,
                  max_unpool2d)
from ..nn.base import Composed
from .registry import register_model

__all__ = ["SegNet", "get_segnet"]


class SegDownStage(nn.Module):
    """Conv blocks + indexed max-pool (reference segnet.py:44-57)."""

    out_channels: int = 0
    num_layers: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        for j in range(self.num_layers - 1):
            x = conv3x3_block(out_channels=self.out_channels, bias=True,
                              name=f"unit{j + 1}")(x, train=train)
        return max_pool2d_with_indices(2, 2)(x)


class SegUpStage(nn.Module):
    """Unpool + conv blocks (reference segnet.py:58-77)."""

    out_channels: int = 0
    num_layers: int = 3

    @nn.compact
    def __call__(self, x, max_indices, train: bool = False):
        x = max_unpool2d(x, max_indices, 2)
        in_channels = x.shape[-1]
        for j in range(1, self.num_layers):
            oc = in_channels if j < self.num_layers - 1 else self.out_channels
            x = conv3x3_block(out_channels=oc, bias=True,
                              name=f"unit{j + 1}")(x, train=train)
        return x


class SegNet(Composed):
    """SegNet (reference segnet.py:13)."""

    channels: Any = None
    layers: Any = None
    aux: bool = False
    fixed_size: bool = False
    in_size: Tuple[int, int] = (1024, 2048)
    in_channels: int = 3
    num_classes: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        down_channels, up_channels = self.channels
        down_layers, up_layers = self.layers
        indices = []
        for i, oc in enumerate(down_channels):
            x, idx = SegDownStage(out_channels=oc,
                                  num_layers=down_layers[i],
                                  name=f"down_stage{i + 1}")(x, train=train)
            indices.append(idx)
        for i, oc in enumerate(up_channels):
            x = SegUpStage(out_channels=oc, num_layers=up_layers[i],
                           name=f"up_stage{i + 1}")(x, indices[-(i + 1)],
                                                    train=train)
        return conv3x3(out_channels=self.num_classes, bias=True,
                       name="head")(x)


def get_segnet(**kwargs):
    """Config expander (reference segnet.py:137)."""
    channels = [[64, 128, 256, 512, 512], [512, 256, 128, 64, 64]]
    layers = [[3, 3, 4, 4, 4], [4, 4, 4, 3, 2]]
    return SegNet(channels=channels, layers=layers, **kwargs)


@register_model("segnet_cityscapes")
def segnet_cityscapes(num_classes: int = 19, **kwargs):
    return get_segnet(num_classes=num_classes, **kwargs)
