"""DRN (Dilated Residual Networks), TPU-native. Behavioral reference:
pytorchcv ``models/drn.py`` (DRNConv:11, DRNBlock:110, DRNBottleneck:146,
DRNUnit:195, DRN:284, get_drn:364)."""

from __future__ import annotations

from functools import reduce
from typing import Tuple

from flax import linen as nn

from ..nn import BatchNorm, Sequential, conv1x1, global_avg_pool2d
from ..nn.base import conv_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["DRN", "get_drn"]


class DRNConv(nn.Module):
    """conv + BN [+ ReLU] (reference drn.py:11)."""

    out_channels: int = 0
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    activate: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels, (self.kernel_size,) * 2,
                    strides=(self.stride,) * 2,
                    padding=((self.padding,) * 2,) * 2,
                    kernel_dilation=(self.dilation,) * 2, use_bias=False,
                    kernel_init=conv_kernel_init, name="conv")(x)
        x = BatchNorm(name="bn")(x, train=train)
        if self.activate:
            x = nn.relu(x)
        return x


def drn_conv1x1(out_channels, stride, activate, name, parent=None):
    return DRNConv(out_channels=out_channels, kernel_size=1, stride=stride,
                   padding=0, dilation=1, activate=activate, name=name,
                   parent=parent)


def drn_conv3x3(out_channels, stride, dilation, activate, name, parent=None):
    return DRNConv(out_channels=out_channels, kernel_size=3, stride=stride,
                   padding=dilation, dilation=dilation, activate=activate,
                   name=name, parent=parent)


class DRNUnit(nn.Module):
    """DRN unit (reference drn.py:195)."""

    out_channels: int = 0
    stride: int = 1
    dilation: int = 1
    bottleneck: bool = False
    simplified: bool = False
    residual: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        resize_identity = ((in_channels != self.out_channels) or
                           (self.stride != 1)) and self.residual and \
            not self.simplified
        if resize_identity:
            identity = drn_conv1x1(self.out_channels, self.stride, False,
                                   "identity_conv").clone(parent=self)(
                x, train=train)
        else:
            identity = x
        if self.bottleneck:
            mid = self.out_channels // 4
            body = Sequential(layers=(
                drn_conv1x1(mid, 1, True, "conv1"),
                drn_conv3x3(mid, self.stride, self.dilation, True, "conv2"),
                drn_conv1x1(self.out_channels, 1, False, "conv3"),
            ), name="body", parent=None)
        elif self.simplified:
            body = drn_conv3x3(self.out_channels, self.stride, self.dilation,
                               False, "body")
        else:
            body = Sequential(layers=(
                drn_conv3x3(self.out_channels, self.stride, self.dilation,
                            True, "conv1"),
                drn_conv3x3(self.out_channels, 1, self.dilation, False,
                            "conv2"),
            ), name="body", parent=None)
        x = body.clone(parent=self)(x, train=train)
        if self.residual:
            x = x + identity
        return nn.relu(x)


def DRN(channels, init_block_channels: int, dilations, bottlenecks,
        simplifieds, residuals, in_channels: int = 3,
        in_size: Tuple[int, int] = (224, 224),
        num_classes: int = 1000) -> ImageClassifier:
    """DRN-C/D (reference drn.py:284)."""
    layers = [DRNConv(out_channels=init_block_channels, kernel_size=7,
                      stride=1, padding=3, dilation=1, activate=True,
                      name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(DRNUnit(
                out_channels=out_channels, stride=stride,
                dilation=dilations[i][j],
                bottleneck=(bottlenecks[i][j] == 1),
                simplified=(simplifieds[i][j] == 1),
                residual=(residuals[i][j] == 1), name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d(keepdims=True))
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=conv1x1(out_channels=num_classes, bias=True, name="output"),
        output_before_flatten=True,
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_drn(blocks: int, simplified: bool = False, **kwargs):
    """Config expander (reference drn.py:364)."""
    if blocks == 22:
        layers = [1, 1, 2, 2, 2, 2, 1, 1]
    elif blocks == 26:
        layers = [1, 1, 2, 2, 2, 2, 1, 1]
    elif blocks in (38, 42, 54, 58):
        layers = [1, 1, 3, 4, 6, 3, 1, 1]
    elif blocks == 105:
        layers = [1, 1, 3, 4, 23, 3, 1, 1]
    else:
        raise ValueError(f"Unsupported DRN blocks: {blocks}")
    if blocks < 50:
        channels_per_layers = [16, 32, 64, 128, 256, 512, 512, 512]
        bottlenecks_per_layers = [0] * 8
    else:
        channels_per_layers = [16, 32, 256, 512, 1024, 2048, 512, 512]
        bottlenecks_per_layers = [0, 0, 1, 1, 1, 1, 0, 0]
    if simplified:
        simplifieds_per_layers = [1, 1, 0, 0, 0, 0, 1, 1]
        residuals_per_layers = [0, 0, 1, 1, 1, 1, 0, 0]
    else:
        simplifieds_per_layers = [0] * 8
        residuals_per_layers = [1, 1, 1, 1, 1, 1, 0, 0]
    dilations_per_layers = [1, 1, 1, 1, 2, 4, 2, 1]
    downsample = [0, 1, 1, 1, 0, 0, 0, 0]

    def expand(prop):
        return reduce(
            lambda x, y: x + [[y[0]] * y[1]] if y[2] != 0
            else x[:-1] + [x[-1] + [y[0]] * y[1]],
            zip(prop, layers, downsample), [[]])

    return DRN(channels=expand(channels_per_layers),
               init_block_channels=channels_per_layers[0],
               dilations=expand(dilations_per_layers),
               bottlenecks=expand(bottlenecks_per_layers),
               simplifieds=expand(simplifieds_per_layers),
               residuals=expand(residuals_per_layers), **kwargs)


for _name, _blocks, _simpl in [("drnc26", 26, False), ("drnc42", 42, False),
                               ("drnc58", 58, False), ("drnd22", 22, True),
                               ("drnd38", 38, True), ("drnd54", 54, True),
                               ("drnd105", 105, True)]:
    def _make(blocks=_blocks, simplified=_simpl):
        def ctor(**kwargs):
            return get_drn(blocks=blocks, simplified=simplified, **kwargs)
        return ctor
    _ctor = _make()
    _ctor.__name__ = _name
    register_model(_name)(_ctor)
