"""PreResNet (pre-activation ResNet) for ImageNet-1K, TPU-native.

Behavioral reference: pytorchcv ``models/preresnet.py`` (PreResBlock:19,
PreResBottleneck:62, PreResUnit:105, PreResInitBlock:166,
PreResActivation:203, PreResNet:224, get_preresnet:299).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

from flax import linen as nn

from ..nn import (BatchNorm, NormActivation, Sequential, conv1x1,
                  global_avg_pool2d, max_pool2d, pre_conv1x1_block,
                  pre_conv3x3_block)
from ..nn.base import IntPair, dense_kernel_init
from ..nn.conv import _conv2d
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["PreResNet", "PreResBlock", "PreResBottleneck", "PreResUnit",
           "PreResInitBlock", "PreResActivation", "get_preresnet",
           "preresnet_features"]


class PreResBlock(nn.Module):
    """Two pre-activation 3x3 conv blocks; first returns its pre-activation
    (reference preresnet.py:19)."""

    out_channels: int = 0
    stride: IntPair = 1
    bias: bool = False
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x, x_pre_activ = pre_conv3x3_block(
            out_channels=self.out_channels, stride=self.stride,
            bias=self.bias, use_bn=self.use_bn, return_preact=True,
            name="conv1")(x, train=train)
        x = pre_conv3x3_block(out_channels=self.out_channels, bias=self.bias,
                              use_bn=self.use_bn,
                              name="conv2")(x, train=train)
        return x, x_pre_activ


class PreResBottleneck(nn.Module):
    """Pre-activation bottleneck (reference preresnet.py:62)."""

    out_channels: int = 0
    stride: IntPair = 1
    conv1_stride: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = self.out_channels // 4
        x, x_pre_activ = pre_conv1x1_block(
            out_channels=mid_channels,
            stride=(self.stride if self.conv1_stride else 1),
            return_preact=True, name="conv1")(x, train=train)
        x = pre_conv3x3_block(out_channels=mid_channels,
                              stride=(1 if self.conv1_stride else self.stride),
                              name="conv2")(x, train=train)
        x = pre_conv1x1_block(out_channels=self.out_channels,
                              name="conv3")(x, train=train)
        return x, x_pre_activ


class PreResUnit(nn.Module):
    """PreResNet unit: identity taken from the shared pre-activation
    (reference preresnet.py:105)."""

    out_channels: int = 0
    stride: IntPair = 1
    bias: bool = False
    use_bn: bool = True
    bottleneck: bool = True
    conv1_stride: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        resize_identity = (x.shape[-1] != self.out_channels) or \
            (self.stride != 1)
        # Reference-behavior quirk: with use_bn=False the torch PreConvBlock's
        # INPLACE ReLU aliases the unit input, so the residual identity is
        # effectively relu(x), not x (preresnet.py:105 + conv.py inplace
        # activ; only the no-BN path, e.g. LFFD-20, hits this).
        identity = x if self.use_bn else nn.relu(x)
        if self.bottleneck:
            x, x_pre_activ = PreResBottleneck(
                out_channels=self.out_channels, stride=self.stride,
                conv1_stride=self.conv1_stride, name="body")(x, train=train)
        else:
            x, x_pre_activ = PreResBlock(
                out_channels=self.out_channels, stride=self.stride,
                bias=self.bias, use_bn=self.use_bn,
                name="body")(x, train=train)
        if resize_identity:
            identity = conv1x1(out_channels=self.out_channels,
                               stride=self.stride, bias=self.bias,
                               name="identity_conv")(x_pre_activ)
        return x + identity


class PreResInitBlock(nn.Module):
    """Stem: plain conv7x7/2 + BN + ReLU + maxpool
    (reference preresnet.py:166)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv2d(self.out_channels, 7, stride=2, padding=3,
                    name="conv")(x)
        x = BatchNorm(name="bn")(x, train=train)
        x = nn.relu(x)
        return max_pool2d(kernel_size=3, stride=2, padding=1)(x)


class PreResActivation(NormActivation):
    """Final BN+ReLU (reference preresnet.py:203)."""


def preresnet_features(channels, init_block_channels: int, bottleneck: bool,
                       conv1_stride: bool, final_pool: bool = True):
    stages = []
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(PreResUnit(
                out_channels=out_channels, stride=stride,
                bottleneck=bottleneck, conv1_stride=conv1_stride,
                name=f"unit{j + 1}"))
        stages.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers = [PreResInitBlock(out_channels=init_block_channels,
                              name="init_block"),
              *stages,
              PreResActivation(name="post_activ")]
    if final_pool:
        layers.append(global_avg_pool2d(keepdims=False))
    return Sequential(layers=tuple(layers), name="features")


def PreResNet(channels, init_block_channels: int, bottleneck: bool,
              conv1_stride: bool, in_channels: int = 3,
              in_size: Tuple[int, int] = (224, 224),
              num_classes: int = 1000) -> ImageClassifier:
    """PreResNet (reference preresnet.py:224)."""
    return ImageClassifier(
        features=preresnet_features(channels, init_block_channels, bottleneck,
                                    conv1_stride),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


_LAYER_TABLE = {
    (10, False): [1, 1, 1, 1],
    (12, False): [2, 1, 1, 1],
    (14, False): [2, 2, 1, 1],
    (14, True): [1, 1, 1, 1],
    (16, False): [2, 2, 2, 1],
    (18, False): [2, 2, 2, 2],
    (26, False): [3, 3, 3, 3],
    (26, True): [2, 2, 2, 2],
    (34, False): [3, 4, 6, 3],
    (38, True): [3, 3, 3, 3],
    (50, True): [3, 4, 6, 3],
    (101, True): [3, 4, 23, 3],
    (152, True): [3, 8, 36, 3],
    (200, True): [3, 24, 36, 3],
    (269, True): [3, 30, 48, 8],
}


def get_preresnet(blocks: int, bottleneck: Optional[bool] = None,
                  conv1_stride: bool = True, width_scale: float = 1.0,
                  **kwargs):
    """Config expander (reference preresnet.py:299)."""
    if bottleneck is None:
        bottleneck = (blocks >= 50)
    key = (blocks, bool(bottleneck))
    if key not in _LAYER_TABLE:
        raise ValueError(f"Unsupported PreResNet blocks={blocks}")
    layers = _LAYER_TABLE[key]

    init_block_channels = 64
    channels_per_layers = [64, 128, 256, 512]
    if bottleneck:
        channels_per_layers = [ci * 4 for ci in channels_per_layers]
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    if width_scale != 1.0:
        channels = [[int(cij * width_scale)
                     if (i != len(channels) - 1) or (j != len(ci) - 1)
                     else cij for j, cij in enumerate(ci)]
                    for i, ci in enumerate(channels)]
        init_block_channels = int(init_block_channels * width_scale)

    return PreResNet(
        channels=tuple(tuple(c) for c in channels),
        init_block_channels=init_block_channels,
        bottleneck=bottleneck, conv1_stride=conv1_stride, **kwargs)


def _variant(name, **cfg):
    @register_model(name)
    def ctor(**kwargs):
        return get_preresnet(**cfg, **kwargs)
    ctor.__name__ = name
    ctor.__doc__ = f"{name} (reference preresnet.py registered variant)."
    return ctor


preresnet10 = _variant("preresnet10", blocks=10)
preresnet12 = _variant("preresnet12", blocks=12)
preresnet14 = _variant("preresnet14", blocks=14)
preresnetbc14b = _variant("preresnetbc14b", blocks=14, bottleneck=True,
                          conv1_stride=False)
preresnet16 = _variant("preresnet16", blocks=16)
preresnet18_wd4 = _variant("preresnet18_wd4", blocks=18, width_scale=0.25)
preresnet18_wd2 = _variant("preresnet18_wd2", blocks=18, width_scale=0.5)
preresnet18_w3d4 = _variant("preresnet18_w3d4", blocks=18, width_scale=0.75)
preresnet18 = _variant("preresnet18", blocks=18)
preresnet26 = _variant("preresnet26", blocks=26, bottleneck=False)
preresnetbc26b = _variant("preresnetbc26b", blocks=26, bottleneck=True,
                          conv1_stride=False)
preresnet34 = _variant("preresnet34", blocks=34)
preresnetbc38b = _variant("preresnetbc38b", blocks=38, bottleneck=True,
                          conv1_stride=False)
preresnet50 = _variant("preresnet50", blocks=50)
preresnet50b = _variant("preresnet50b", blocks=50, conv1_stride=False)
preresnet101 = _variant("preresnet101", blocks=101)
preresnet101b = _variant("preresnet101b", blocks=101, conv1_stride=False)
preresnet152 = _variant("preresnet152", blocks=152)
preresnet152b = _variant("preresnet152b", blocks=152, conv1_stride=False)
preresnet200 = _variant("preresnet200", blocks=200)
preresnet200b = _variant("preresnet200b", blocks=200, conv1_stride=False)
preresnet269b = _variant("preresnet269b", blocks=269, conv1_stride=False)
