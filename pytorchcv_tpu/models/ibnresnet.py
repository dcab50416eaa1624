"""IBN-ResNet, TPU-native. Behavioral reference: pytorchcv
``models/ibnresnet.py`` (IBNConvBlock:13, ibn_conv1x1_block:83,
IBNResBottleneck:123, IBNResUnit:170, IBNResNet:221, get_ibnresnet:291)."""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import (BatchNorm, IBN, Sequential, conv1x1, conv1x1_block,
                  conv3x3_block, global_avg_pool2d)
from ..nn.base import dense_kernel_init
from .registry import register_model
from .resnet import ResInitBlock
from .shell import ImageClassifier

__all__ = ["IBNResNet", "get_ibnresnet", "ibn_conv1x1_block", "IBNConvBlock"]


class IBNConvBlock(nn.Module):
    """conv + (IBN|BN) + ReLU (reference ibnresnet.py:13)."""

    out_channels: int = 0
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    bias: bool = False
    use_ibn: bool = False
    activate: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..nn.conv import _conv2d
        x = _conv2d(self.out_channels, self.kernel_size, self.stride,
                    self.padding, self.dilation, self.groups, self.bias,
                    name="conv")(x)
        if self.use_ibn:
            x = IBN(channels=self.out_channels, name="ibn")(x, train=train)
        else:
            x = BatchNorm(name="bn")(x, train=train)
        if self.activate:
            x = nn.relu(x)
        return x


def ibn_conv1x1_block(out_channels=0, stride=1, groups=1, bias=False,
                      use_ibn=False, activate=True, **kw):
    """1x1 IBN conv block (reference ibnresnet.py:83)."""
    return IBNConvBlock(out_channels=out_channels, kernel_size=1,
                        stride=stride, padding=0, groups=groups, bias=bias,
                        use_ibn=use_ibn, activate=activate, **kw)


class IBNResUnit(nn.Module):
    """IBN-ResNet unit (reference ibnresnet.py:170)."""

    out_channels: int = 0
    stride: int = 1
    conv1_ibn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        resize_identity = (in_channels != self.out_channels) or \
            (self.stride != 1)
        if resize_identity:
            identity = conv1x1_block(
                out_channels=self.out_channels, stride=self.stride,
                activation=None, name="identity_conv")(x, train=train)
        else:
            identity = x
        mid_channels = self.out_channels // 4
        x = Sequential(layers=(
            ibn_conv1x1_block(out_channels=mid_channels,
                              use_ibn=self.conv1_ibn, name="conv1",
                              parent=None),
            conv3x3_block(out_channels=mid_channels, stride=self.stride,
                          name="conv2", parent=None),
            conv1x1_block(out_channels=self.out_channels, activation=None,
                          name="conv3", parent=None),
        ), name="body")(x, train=train)
        return nn.relu(x + identity)


def IBNResNet(channels, init_block_channels: int, in_channels: int = 3,
              in_size: Tuple[int, int] = (224, 224),
              num_classes: int = 1000) -> ImageClassifier:
    """IBN-ResNet (reference ibnresnet.py:221)."""
    layers = [ResInitBlock(out_channels=init_block_channels,
                           name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(IBNResUnit(out_channels=out_channels, stride=stride,
                                    conv1_ibn=(out_channels < 2048),
                                    name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_ibnresnet(blocks: int, **kwargs):
    """Config expander (reference ibnresnet.py:291)."""
    table = {50: [3, 4, 6, 3], 101: [3, 4, 23, 3], 152: [3, 8, 36, 3]}
    if blocks not in table:
        raise ValueError(f"Unsupported IBN-ResNet blocks: {blocks}")
    channels = [[ci] * li for ci, li in
                zip([256, 512, 1024, 2048], table[blocks])]
    return IBNResNet(channels=channels, init_block_channels=64, **kwargs)


@register_model("ibn_resnet50")
def ibn_resnet50(**kwargs):
    return get_ibnresnet(blocks=50, **kwargs)


@register_model("ibn_resnet101")
def ibn_resnet101(**kwargs):
    return get_ibnresnet(blocks=101, **kwargs)


@register_model("ibn_resnet152")
def ibn_resnet152(**kwargs):
    return get_ibnresnet(blocks=152, **kwargs)
