"""SE-PreResNet, TPU-native. Behavioral reference: pytorchcv
``models/sepreresnet.py`` (SEPreResUnit:17, SEPreResNet:76,
get_sepreresnet:147)."""

from __future__ import annotations

from typing import Optional, Tuple

from flax import linen as nn

from ..nn import SEBlock, Sequential, conv1x1, global_avg_pool2d
from ..nn.base import IntPair, dense_kernel_init
from .preresnet import (PreResActivation, PreResBlock, PreResBottleneck,
                        PreResInitBlock)
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["SEPreResNet", "SEPreResUnit", "get_sepreresnet"]


class SEPreResUnit(nn.Module):
    """PreResNet unit + SE gate (reference sepreresnet.py:17)."""

    out_channels: int = 0
    stride: IntPair = 1
    bottleneck: bool = True
    conv1_stride: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        resize_identity = (x.shape[-1] != self.out_channels) or \
            (self.stride != 1)
        identity = x
        if self.bottleneck:
            x, x_pre_activ = PreResBottleneck(
                out_channels=self.out_channels, stride=self.stride,
                conv1_stride=self.conv1_stride, name="body")(x, train=train)
        else:
            x, x_pre_activ = PreResBlock(
                out_channels=self.out_channels, stride=self.stride,
                name="body")(x, train=train)
        x = SEBlock(channels=self.out_channels, name="se")(x)
        if resize_identity:
            identity = conv1x1(out_channels=self.out_channels,
                               stride=self.stride,
                               name="identity_conv")(x_pre_activ)
        return x + identity


def SEPreResNet(channels, init_block_channels: int, bottleneck: bool,
                conv1_stride: bool, in_channels: int = 3,
                in_size: Tuple[int, int] = (224, 224),
                num_classes: int = 1000) -> ImageClassifier:
    """SE-PreResNet (reference sepreresnet.py:76)."""
    layers = [PreResInitBlock(out_channels=init_block_channels,
                              name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(SEPreResUnit(
                out_channels=out_channels, stride=stride,
                bottleneck=bottleneck, conv1_stride=conv1_stride,
                name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(PreResActivation(name="post_activ"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
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


def get_sepreresnet(blocks: int, bottleneck: Optional[bool] = None,
                    conv1_stride: bool = True, **kwargs):
    """Config expander (reference sepreresnet.py:147)."""
    if bottleneck is None:
        bottleneck = (blocks >= 50)
    key = (blocks, bool(bottleneck))
    if key not in _LAYER_TABLE:
        raise ValueError(f"Unsupported SE-PreResNet blocks: {blocks}")
    layers = _LAYER_TABLE[key]
    channels_per_layers = [64, 128, 256, 512]
    if bottleneck:
        channels_per_layers = [ci * 4 for ci in channels_per_layers]
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    return SEPreResNet(channels=channels, init_block_channels=64,
                       bottleneck=bottleneck, conv1_stride=conv1_stride,
                       **kwargs)


def _variant(name, **cfg):
    @register_model(name)
    def ctor(**kwargs):
        return get_sepreresnet(**cfg, **kwargs)
    ctor.__name__ = name
    return ctor


sepreresnet10 = _variant("sepreresnet10", blocks=10)
sepreresnet12 = _variant("sepreresnet12", blocks=12)
sepreresnet14 = _variant("sepreresnet14", blocks=14)
sepreresnet16 = _variant("sepreresnet16", blocks=16)
sepreresnet18 = _variant("sepreresnet18", blocks=18)
sepreresnet26 = _variant("sepreresnet26", blocks=26, bottleneck=False)
sepreresnetbc26b = _variant("sepreresnetbc26b", blocks=26, bottleneck=True,
                            conv1_stride=False)
sepreresnet34 = _variant("sepreresnet34", blocks=34)
sepreresnetbc38b = _variant("sepreresnetbc38b", blocks=38, bottleneck=True,
                            conv1_stride=False)
sepreresnet50 = _variant("sepreresnet50", blocks=50)
sepreresnet50b = _variant("sepreresnet50b", blocks=50, conv1_stride=False)
sepreresnet101 = _variant("sepreresnet101", blocks=101)
sepreresnet101b = _variant("sepreresnet101b", blocks=101,
                           conv1_stride=False)
sepreresnet152 = _variant("sepreresnet152", blocks=152)
sepreresnet152b = _variant("sepreresnet152b", blocks=152,
                           conv1_stride=False)
sepreresnet200 = _variant("sepreresnet200", blocks=200)
sepreresnet200b = _variant("sepreresnet200b", blocks=200,
                           conv1_stride=False)
