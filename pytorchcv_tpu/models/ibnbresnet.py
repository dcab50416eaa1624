"""IBN(b)-ResNet, TPU-native. Behavioral reference: pytorchcv
``models/ibnbresnet.py`` (IBNbConvBlock:12, ibnb_conv7x7_block:82,
IBNbResUnit:117, IBNbResInitBlock:176, IBNbResNet:207, get_ibnbresnet:277)."""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import Sequential, conv1x1_block, global_avg_pool2d, max_pool2d
from ..nn.base import conv_kernel_init, dense_kernel_init
from ..nn.norm import InstanceNorm
from .registry import register_model
from .resnet import ResBottleneck
from .shell import ImageClassifier

__all__ = ["IBNbResNet", "get_ibnbresnet"]


class IBNbConvBlock(nn.Module):
    """conv + affine InstanceNorm + ReLU (reference ibnbresnet.py:12)."""

    out_channels: int = 0
    kernel_size: int = 7
    stride: int = 1
    padding: int = 3
    bias: bool = False
    activate: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels, (self.kernel_size,) * 2,
                    strides=(self.stride,) * 2,
                    padding=((self.padding,) * 2,) * 2, use_bias=self.bias,
                    kernel_init=conv_kernel_init, name="conv")(x)
        x = InstanceNorm(affine=True, name="inst_norm")(x)
        if self.activate:
            x = nn.relu(x)
        return x


class IBNbResUnit(nn.Module):
    """ResNet bottleneck unit with optional post-add InstanceNorm
    (reference ibnbresnet.py:117)."""

    out_channels: int = 0
    stride: int = 1
    use_inst_norm: bool = False

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
        x = ResBottleneck(out_channels=self.out_channels, stride=self.stride,
                          conv1_stride=False, name="body")(x, train=train)
        x = x + identity
        if self.use_inst_norm:
            x = InstanceNorm(affine=True, name="inst_norm")(x)
        return nn.relu(x)


class IBNbResInitBlock(nn.Module):
    """IN-normalized 7x7 stem + max pool (reference ibnbresnet.py:176)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = IBNbConvBlock(out_channels=self.out_channels, stride=2,
                          name="conv")(x, train=train)
        return max_pool2d(3, 2, padding=1)(x)


def IBNbResNet(channels, init_block_channels: int, in_channels: int = 3,
               in_size: Tuple[int, int] = (224, 224),
               num_classes: int = 1000) -> ImageClassifier:
    """IBN(b)-ResNet (reference ibnbresnet.py:207)."""
    layers = [IBNbResInitBlock(out_channels=init_block_channels,
                               name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            use_inst_norm = (i < 2) and (j == len(channels_per_stage) - 1)
            units.append(IBNbResUnit(out_channels=out_channels,
                                     stride=stride,
                                     use_inst_norm=use_inst_norm,
                                     name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_ibnbresnet(blocks: int, **kwargs):
    """Config expander (reference ibnbresnet.py:277)."""
    table = {50: [3, 4, 6, 3], 101: [3, 4, 23, 3], 152: [3, 8, 36, 3]}
    if blocks not in table:
        raise ValueError(f"Unsupported IBN(b)-ResNet blocks: {blocks}")
    channels = [[ci] * li for ci, li in
                zip([256, 512, 1024, 2048], table[blocks])]
    return IBNbResNet(channels=channels, init_block_channels=64, **kwargs)


@register_model("ibnb_resnet50")
def ibnb_resnet50(**kwargs):
    return get_ibnbresnet(blocks=50, **kwargs)


@register_model("ibnb_resnet101")
def ibnb_resnet101(**kwargs):
    return get_ibnbresnet(blocks=101, **kwargs)


@register_model("ibnb_resnet152")
def ibnb_resnet152(**kwargs):
    return get_ibnbresnet(blocks=152, **kwargs)
