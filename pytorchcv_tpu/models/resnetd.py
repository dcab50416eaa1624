"""ResNet(D) — dilated, multi-bend segmentation backbone, TPU-native.
Behavioral reference: pytorchcv ``models/resnetd.py`` (ResNetD:15,
multi_output bends:53/80/103, get_resnetd:110). SENet deep stem by default
(init channels doubled); stage taps exposed for dense-prediction heads.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from flax import linen as nn

from ..nn import MultiOutputSequential, Sequential, global_avg_pool2d
from ..nn.base import dense_kernel_init
from .registry import register_model
from .resnet import ResInitBlock, ResUnit
from .senet import SEInitBlock
from .shell import ImageClassifier

__all__ = ["ResNetD", "resnetd_features", "get_resnetd"]


_LAYERS = {10: [1, 1, 1, 1], 12: [2, 1, 1, 1], 14: [2, 2, 1, 1],
           16: [2, 2, 2, 1], 18: [2, 2, 2, 2], 34: [3, 4, 6, 3],
           50: [3, 4, 6, 3], 101: [3, 4, 23, 3], 152: [3, 8, 36, 3],
           200: [3, 24, 36, 3]}


def resnetd_features(channels, init_block_channels: int, bottleneck: bool,
                     conv1_stride: bool, ordinary_init: bool = False,
                     bends: Optional[Sequence[int]] = None,
                     final_pool: bool = True,
                     name: str = "features") -> MultiOutputSequential:
    """ResNet(D) trunk with dilated stages 3/4 and optional stage taps."""
    if ordinary_init:
        init_block = ResInitBlock(out_channels=init_block_channels,
                                  name="init_block")
    else:
        init_block_channels = 2 * init_block_channels
        init_block = SEInitBlock(out_channels=init_block_channels,
                                 name="init_block")
    layers = [init_block]
    output_idx = []
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if ((j == 0) and (i != 0) and (i < 2)) else 1
            dilation = 2 ** max(0, i - 1 - int(j == 0))
            units.append(ResUnit(
                out_channels=out_channels, stride=stride, padding=dilation,
                dilation=dilation, bottleneck=bottleneck,
                conv1_stride=conv1_stride, name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
        if bends is not None and (i + 1) in tuple(bends):
            output_idx.append(len(layers) - 1)
    if final_pool:
        layers.append(global_avg_pool2d())
    return MultiOutputSequential(layers=tuple(layers),
                                 output_idx=tuple(output_idx), name=name)


from ..nn.base import Composed as _Composed  # noqa: E402


class ResNetD(_Composed):
    """ResNet(D) classifier shell preserving the reference's multi-output
    contract (reference resnetd.py:99-107: returns
    [logits, *bend_features])."""

    features: object = None
    output: object = None
    multi_output: bool = False
    in_size: Tuple[int, int] = (224, 224)
    in_channels: int = 3
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = self.adopt_call(self.features, x, train=train)
        x = outs[0].reshape(outs[0].shape[0], -1)
        x = self.adopt_call(self.output, x, train=train)
        if self.multi_output:
            return [x] + outs[1:]
        return x


def get_resnetd(blocks: int, conv1_stride: bool = True,
                width_scale: float = 1.0, ordinary_init: bool = False,
                bends: Optional[Sequence[int]] = None, in_channels: int = 3,
                in_size: Tuple[int, int] = (224, 224),
                num_classes: int = 1000):
    """Config expander (reference resnetd.py:110)."""
    if blocks not in _LAYERS:
        raise ValueError(f"Unsupported ResNet(D) blocks: {blocks}")
    layers = _LAYERS[blocks]
    bottleneck = (blocks >= 50)
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
    features = resnetd_features(channels, init_block_channels, bottleneck,
                                conv1_stride, ordinary_init, bends)
    return ResNetD(
        features=features,
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        multi_output=(bends is not None),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def _variant(name, **cfg):
    @register_model(name)
    def ctor(**kwargs):
        return get_resnetd(**cfg, **kwargs)
    ctor.__name__ = name
    return ctor


resnetd50b = _variant("resnetd50b", blocks=50, conv1_stride=False)
resnetd101b = _variant("resnetd101b", blocks=101, conv1_stride=False)
resnetd152b = _variant("resnetd152b", blocks=152, conv1_stride=False)
