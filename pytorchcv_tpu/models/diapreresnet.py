"""DIA-PreResNet, TPU-native. Behavioral reference: pytorchcv
``models/diapreresnet.py`` (DIAPreResUnit:17, DIAPreResNet:92,
get_diapreresnet:180). Shares the stage-level DIA attention mechanism from
``diaresnet``."""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import Sequential, conv1x1, global_avg_pool2d
from ..nn.base import dense_kernel_init
from .diaresnet import DIAAttention, DIAStage
from .preresnet import (PreResActivation, PreResBlock, PreResBottleneck,
                        PreResInitBlock)
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["DIAPreResNet", "get_diapreresnet", "DIAPreResUnit"]


class DIAPreResUnit(nn.Module):
    """DIA-PreResNet unit; attention passed in bound
    (reference diapreresnet.py:17)."""

    out_channels: int = 0
    stride: int = 1
    bottleneck: bool = True
    conv1_stride: bool = False

    @nn.compact
    def __call__(self, x, hc, attention, train: bool = False):
        in_channels = x.shape[-1]
        resize_identity = (in_channels != self.out_channels) or \
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
        if resize_identity:
            identity = conv1x1(out_channels=self.out_channels,
                               stride=self.stride,
                               name="identity_conv")(x_pre_activ)
        x, hc = attention(x, hc, train=train)
        return x + identity, hc


def DIAPreResNet(channels, init_block_channels: int, bottleneck: bool,
                 conv1_stride: bool, in_channels: int = 3,
                 in_size: Tuple[int, int] = (224, 224),
                 num_classes: int = 1000) -> ImageClassifier:
    """DIA-PreResNet (reference diapreresnet.py:92)."""
    layers = [PreResInitBlock(out_channels=init_block_channels,
                              name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 1 if (i == 0) or (j != 0) else 2
            units.append(DIAPreResUnit(
                out_channels=out_channels, stride=stride,
                bottleneck=bottleneck, conv1_stride=conv1_stride,
                name=f"unit{j + 1}", parent=None))
        layers.append(DIAStage(units=tuple(units),
                               attention_channels=channels_per_stage[0],
                               name=f"stage{i + 1}"))
    layers.append(PreResActivation(name="post_activ"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_diapreresnet(blocks: int, bottleneck: bool = None,
                     conv1_stride: bool = True, width_scale: float = 1.0,
                     **kwargs):
    """Config expander (reference diapreresnet.py:180)."""
    if bottleneck is None:
        bottleneck = (blocks >= 50)
    table = {
        (10, False): [1, 1, 1, 1], (12, False): [2, 1, 1, 1],
        (14, False): [2, 2, 1, 1], (14, True): [1, 1, 1, 1],
        (16, False): [2, 2, 2, 1], (18, False): [2, 2, 2, 2],
        (26, False): [3, 3, 3, 3], (26, True): [2, 2, 2, 2],
        (34, False): [3, 4, 6, 3], (38, True): [3, 3, 3, 3],
        (50, True): [3, 4, 6, 3], (101, True): [3, 4, 23, 3],
        (152, True): [3, 8, 36, 3], (200, True): [3, 24, 36, 3],
        (269, True): [3, 30, 48, 8],
    }
    key = (blocks, bool(bottleneck))
    if key not in table:
        raise ValueError(f"Unsupported DIA-PreResNet blocks: {blocks}")
    layers = table[key]
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
    return DIAPreResNet(channels=channels,
                        init_block_channels=init_block_channels,
                        bottleneck=bottleneck, conv1_stride=conv1_stride,
                        **kwargs)


_VARIANTS = [
    ("diapreresnet10", dict(blocks=10)),
    ("diapreresnet12", dict(blocks=12)),
    ("diapreresnet14", dict(blocks=14)),
    ("diapreresnetbc14b",
     dict(blocks=14, bottleneck=True, conv1_stride=False)),
    ("diapreresnet16", dict(blocks=16)),
    ("diapreresnet18", dict(blocks=18)),
    ("diapreresnet26", dict(blocks=26, bottleneck=False)),
    ("diapreresnetbc26b",
     dict(blocks=26, bottleneck=True, conv1_stride=False)),
    ("diapreresnet34", dict(blocks=34)),
    ("diapreresnetbc38b",
     dict(blocks=38, bottleneck=True, conv1_stride=False)),
    ("diapreresnet50", dict(blocks=50)),
    ("diapreresnet50b", dict(blocks=50, conv1_stride=False)),
    ("diapreresnet101", dict(blocks=101)),
    ("diapreresnet101b", dict(blocks=101, conv1_stride=False)),
    ("diapreresnet152", dict(blocks=152)),
    ("diapreresnet152b", dict(blocks=152, conv1_stride=False)),
    ("diapreresnet200", dict(blocks=200)),
    ("diapreresnet200b", dict(blocks=200, conv1_stride=False)),
    ("diapreresnet269b", dict(blocks=269, conv1_stride=False)),
]

for _name, _cfg in _VARIANTS:
    def _make(cfg=_cfg):
        def ctor(**kwargs):
            return get_diapreresnet(**cfg, **kwargs)
        return ctor
    _ctor = _make()
    _ctor.__name__ = _name
    register_model(_name)(_ctor)
