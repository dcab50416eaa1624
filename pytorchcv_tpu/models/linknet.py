"""LinkNet, TPU-native. Behavioral reference: pytorchcv ``models/linknet.py``
(DecoderStage:15, LinkNetHead:66, LinkNet:113, get_linknet:201,
linknet_cityscapes:249). ResNet-18 encoder with additive skip links."""

from __future__ import annotations

from typing import Any, Tuple

from flax import linen as nn

from ..nn import (Hourglass, Identity, conv1x1_block, conv3x3_block,
                  deconv3x3_block)
from ..nn.base import Composed
from ..nn.conv import ConvTranspose2d
from .registry import register_model
from .resnet import resnet_features

__all__ = ["LinkNet", "get_linknet"]


class DecoderStage(nn.Module):
    """1x1 -> deconv 3x3 -> 1x1 (reference linknet.py:15)."""

    out_channels: int = 0
    stride: int = 2
    output_padding: int = 1
    bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = x.shape[-1] // 4
        x = conv1x1_block(out_channels=mid_channels, bias=self.bias,
                          name="conv1")(x, train=train)
        x = deconv3x3_block(out_channels=mid_channels, stride=self.stride,
                            out_padding=self.output_padding, bias=self.bias,
                            name="conv2")(x, train=train)
        return conv1x1_block(out_channels=self.out_channels, bias=self.bias,
                             name="conv3")(x, train=train)


class LinkNetHead(nn.Module):
    """deconv + conv + deconv head (reference linknet.py:66)."""

    num_classes: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = x.shape[-1] // 2
        x = deconv3x3_block(out_channels=mid_channels, stride=2, padding=1,
                            out_padding=1, bias=True,
                            name="conv1")(x, train=train)
        x = conv3x3_block(out_channels=mid_channels, bias=True,
                          name="conv2")(x, train=train)
        return ConvTranspose2d(out_channels=self.num_classes, kernel_size=2,
                               stride=2, padding=0, bias=True,
                               name="conv3")(x)


class LinkNet(Composed):
    """LinkNet (reference linknet.py:113)."""

    backbone_stem: Any = None
    backbone_stages: Any = None
    channels: Any = None
    strides: Any = None
    output_paddings: Any = None
    aux: bool = False
    fixed_size: bool = False
    in_size: Tuple[int, int] = (1024, 2048)
    in_channels: int = 3
    num_classes: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = self.adopt_call(self.backbone_stem, x, train=train)
        down_seq = tuple(self.backbone_stages)
        ups = [DecoderStage(out_channels=oc, stride=self.strides[i],
                            output_padding=self.output_paddings[i],
                            bias=False, name=f"up{i + 1}", parent=None)
               for i, oc in enumerate(self.channels)]
        up_seq = tuple(ups[::-1])
        skip_seq = tuple(Identity() for _ in self.channels)
        x = Hourglass(down_seq=down_seq, up_seq=up_seq, skip_seq=skip_seq,
                      merge_type="add", name="hg")(x, train=train)
        return LinkNetHead(num_classes=self.num_classes,
                           name="head")(x, train=train)


def get_linknet(backbone_stem, backbone_stages, **kwargs):
    """Config expander (reference linknet.py:201)."""
    channels = [256, 128, 64, 64]
    strides = [2, 2, 2, 1]
    output_paddings = [1, 1, 1, 0]
    return LinkNet(backbone_stem=backbone_stem,
                   backbone_stages=backbone_stages, channels=channels,
                   strides=strides, output_paddings=output_paddings,
                   **kwargs)


@register_model("linknet_cityscapes")
def linknet_cityscapes(num_classes: int = 19, **kwargs):
    # resnet18 trunk: init_block + stage1..4 (reference linknet.py:249-263)
    from ..nn.base import Held
    feats = resnet_features(
        channels=[[64, 64], [128, 128], [256, 256], [512, 512]],
        init_block_channels=64, bottleneck=False, conv1_stride=True,
        final_pool=False)

    def unwrap(m):
        return m.module if isinstance(m, Held) else m

    stem = unwrap(feats.layers[0]).clone(name="stem")
    stages = tuple(unwrap(feats.layers[i]).clone(name=f"down{i}")
                   for i in range(1, 5))
    return get_linknet(backbone_stem=stem, backbone_stages=stages,
                       num_classes=num_classes, **kwargs)
