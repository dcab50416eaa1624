"""SE-ResNet, TPU-native. Behavioral reference: pytorchcv
``models/seresnet.py`` (SEResUnit:17, SEResNet:76, get_seresnet:149).
ResNet units with an SE gate between body and residual add.
"""

from __future__ import annotations

from typing import Optional, Tuple

from flax import linen as nn

from ..nn import SEBlock, Sequential, conv1x1_block, global_avg_pool2d
from ..nn.base import IntPair, dense_kernel_init
from .registry import register_model
from .resnet import ResBlock, ResBottleneck, ResInitBlock
from .shell import ImageClassifier

__all__ = ["SEResNet", "SEResUnit", "get_seresnet"]


class SEResUnit(nn.Module):
    """ResNet unit + SE gate (reference seresnet.py:17)."""

    out_channels: int = 0
    stride: IntPair = 1
    bottleneck: bool = True
    conv1_stride: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        resize_identity = (x.shape[-1] != self.out_channels) or \
            (self.stride != 1)
        if resize_identity:
            identity = conv1x1_block(out_channels=self.out_channels,
                                     stride=self.stride, activation=None,
                                     name="identity_conv")(x, train=train)
        else:
            identity = x
        if self.bottleneck:
            x = ResBottleneck(out_channels=self.out_channels,
                              stride=self.stride,
                              conv1_stride=self.conv1_stride,
                              name="body")(x, train=train)
        else:
            x = ResBlock(out_channels=self.out_channels, stride=self.stride,
                         name="body")(x, train=train)
        x = SEBlock(channels=self.out_channels, name="se")(x)
        return nn.relu(x + identity)


def SEResNet(channels, init_block_channels: int, bottleneck: bool,
             conv1_stride: bool, in_channels: int = 3,
             in_size: Tuple[int, int] = (224, 224),
             num_classes: int = 1000) -> ImageClassifier:
    """SE-ResNet (reference seresnet.py:76)."""
    layers = [ResInitBlock(out_channels=init_block_channels,
                           name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(SEResUnit(
                out_channels=out_channels, stride=stride,
                bottleneck=bottleneck, conv1_stride=conv1_stride,
                name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
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


def get_seresnet(blocks: int, bottleneck: Optional[bool] = None,
                 conv1_stride: bool = True, **kwargs):
    """Config expander (reference seresnet.py:149)."""
    if bottleneck is None:
        bottleneck = (blocks >= 50)
    key = (blocks, bool(bottleneck))
    if key not in _LAYER_TABLE:
        raise ValueError(f"Unsupported SE-ResNet blocks: {blocks}")
    layers = _LAYER_TABLE[key]
    channels_per_layers = [64, 128, 256, 512]
    if bottleneck:
        channels_per_layers = [ci * 4 for ci in channels_per_layers]
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    return SEResNet(channels=channels, init_block_channels=64,
                    bottleneck=bottleneck, conv1_stride=conv1_stride,
                    **kwargs)


def _variant(name, **cfg):
    @register_model(name)
    def ctor(**kwargs):
        return get_seresnet(**cfg, **kwargs)
    ctor.__name__ = name
    return ctor


seresnet10 = _variant("seresnet10", blocks=10)
seresnet12 = _variant("seresnet12", blocks=12)
seresnet14 = _variant("seresnet14", blocks=14)
seresnet16 = _variant("seresnet16", blocks=16)
seresnet18 = _variant("seresnet18", blocks=18)
seresnet26 = _variant("seresnet26", blocks=26, bottleneck=False)
seresnetbc26b = _variant("seresnetbc26b", blocks=26, bottleneck=True,
                         conv1_stride=False)
seresnet34 = _variant("seresnet34", blocks=34)
seresnetbc38b = _variant("seresnetbc38b", blocks=38, bottleneck=True,
                         conv1_stride=False)
seresnet50 = _variant("seresnet50", blocks=50)
seresnet50b = _variant("seresnet50b", blocks=50, conv1_stride=False)
seresnet101 = _variant("seresnet101", blocks=101)
seresnet101b = _variant("seresnet101b", blocks=101, conv1_stride=False)
seresnet152 = _variant("seresnet152", blocks=152)
seresnet152b = _variant("seresnet152b", blocks=152, conv1_stride=False)
seresnet200 = _variant("seresnet200", blocks=200)
seresnet200b = _variant("seresnet200b", blocks=200, conv1_stride=False)
