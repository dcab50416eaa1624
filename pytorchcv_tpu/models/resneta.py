"""ResNet(A) — average-downsample residual net (pose backbone), TPU-native.
Behavioral reference: pytorchcv ``models/resneta.py`` (ResADownBlock:15,
ResAUnit:52, ResNetA:116, get_resneta:199). SENet deep stem; identity
branch downsamples via ceil-mode average pooling.
"""

from __future__ import annotations

from typing import Optional, Tuple

from flax import linen as nn

from ..nn import Sequential, avg_pool2d, conv1x1_block, global_avg_pool2d
from ..nn.base import IntPair, dense_kernel_init
from .registry import register_model
from .resnet import ResBlock, ResBottleneck
from .senet import SEInitBlock
from .shell import ImageClassifier

__all__ = ["ResNetA", "ResAUnit", "resneta_features", "get_resneta"]


class ResADownBlock(nn.Module):
    """avgpool (ceil, exclude-pad) + 1x1 conv block
    (reference resneta.py:15)."""

    out_channels: int = 0
    stride: IntPair = 1
    dilation: IntPair = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.stride if self.dilation == 1 else 1
        x = avg_pool2d(k, k, 0, ceil_mode=True, count_include_pad=False)(x)
        return conv1x1_block(out_channels=self.out_channels, activation=None,
                             name="conv")(x, train=train)


class ResAUnit(nn.Module):
    """ResNet(A) unit (reference resneta.py:52)."""

    out_channels: int = 0
    stride: IntPair = 1
    padding: IntPair = 1
    dilation: IntPair = 1
    bottleneck: bool = True
    conv1_stride: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        resize_identity = (x.shape[-1] != self.out_channels) or \
            (self.stride != 1)
        if resize_identity:
            identity = ResADownBlock(out_channels=self.out_channels,
                                     stride=self.stride,
                                     dilation=self.dilation,
                                     name="identity_block")(x, train=train)
        else:
            identity = x
        if self.bottleneck:
            x = ResBottleneck(out_channels=self.out_channels,
                              stride=self.stride, padding=self.padding,
                              dilation=self.dilation,
                              conv1_stride=self.conv1_stride,
                              name="body")(x, train=train)
        else:
            x = ResBlock(out_channels=self.out_channels, stride=self.stride,
                         name="body")(x, train=train)
        return nn.relu(x + identity)


def resneta_features(channels, init_block_channels: int, bottleneck: bool,
                     conv1_stride: bool, dilated: bool = False,
                     final_pool: bool = True,
                     name: str = "features") -> Sequential:
    layers = [SEInitBlock(out_channels=init_block_channels,
                          name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            if dilated:
                stride = 2 if ((j == 0) and (i != 0) and (i < 2)) else 1
                dilation = 2 ** max(0, i - 1 - int(j == 0))
            else:
                stride = 2 if (j == 0) and (i != 0) else 1
                dilation = 1
            units.append(ResAUnit(
                out_channels=out_channels, stride=stride, padding=dilation,
                dilation=dilation, bottleneck=bottleneck,
                conv1_stride=conv1_stride, name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    if final_pool:
        layers.append(global_avg_pool2d())
    return Sequential(layers=tuple(layers), name=name)


def ResNetA(channels, init_block_channels: int, bottleneck: bool,
            conv1_stride: bool, dilated: bool = False, in_channels: int = 3,
            in_size: Tuple[int, int] = (224, 224),
            num_classes: int = 1000) -> ImageClassifier:
    """ResNet(A) (reference resneta.py:116)."""
    return ImageClassifier(
        features=resneta_features(channels, init_block_channels, bottleneck,
                                  conv1_stride, dilated),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


_LAYER_TABLE = {
    (10, False): [1, 1, 1, 1], (12, False): [2, 1, 1, 1],
    (14, False): [2, 2, 1, 1], (14, True): [1, 1, 1, 1],
    (16, False): [2, 2, 2, 1], (18, False): [2, 2, 2, 2],
    (26, False): [3, 3, 3, 3], (26, True): [2, 2, 2, 2],
    (34, False): [3, 4, 6, 3], (38, True): [3, 3, 3, 3],
    (50, True): [3, 4, 6, 3], (101, True): [3, 4, 23, 3],
    (152, True): [3, 8, 36, 3], (200, True): [3, 24, 36, 3],
}


def get_resneta(blocks: int, bottleneck: Optional[bool] = None,
                conv1_stride: bool = True, width_scale: float = 1.0,
                **kwargs):
    """Config expander (reference resneta.py:199)."""
    if bottleneck is None:
        bottleneck = (blocks >= 50)
    key = (blocks, bool(bottleneck))
    if key not in _LAYER_TABLE:
        raise ValueError(f"Unsupported ResNet(A) blocks: {blocks}")
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
    return ResNetA(channels=channels,
                   init_block_channels=init_block_channels,
                   bottleneck=bottleneck, conv1_stride=conv1_stride,
                   **kwargs)


def _variant(name, **cfg):
    @register_model(name)
    def ctor(**kwargs):
        return get_resneta(**cfg, **kwargs)
    ctor.__name__ = name
    return ctor


resneta10 = _variant("resneta10", blocks=10)
resnetabc14b = _variant("resnetabc14b", blocks=14, bottleneck=True,
                        conv1_stride=False)
resneta18 = _variant("resneta18", blocks=18)
resneta50b = _variant("resneta50b", blocks=50, conv1_stride=False)
resneta101b = _variant("resneta101b", blocks=101, conv1_stride=False)
resneta152b = _variant("resneta152b", blocks=152, conv1_stride=False)
