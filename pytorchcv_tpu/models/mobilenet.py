"""MobileNet (v1), TPU-native. Behavioral reference: pytorchcv
``models/mobilenet.py`` (MobileNet:17, get_mobilenet:101). Depthwise-
separable stacks; the dw+pw pair fuses into two MXU kernels under XLA.
"""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import (Sequential, conv3x3_block, dwsconv3x3_block,
                  global_avg_pool2d, lambda_relu)
from ..nn.base import dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["MobileNet", "get_mobilenet"]


def MobileNet(channels, first_stage_stride: bool, dw_use_bn: bool = True,
              dw_activation=lambda_relu(), in_channels: int = 3,
              in_size: Tuple[int, int] = (224, 224),
              num_classes: int = 1000) -> ImageClassifier:
    """MobileNet (reference mobilenet.py:17)."""
    init_block_channels = channels[0][0]
    layers = [conv3x3_block(out_channels=init_block_channels, stride=2,
                            name="init_block")]
    for i, channels_per_stage in enumerate(channels[1:]):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and ((i != 0) or first_stage_stride) else 1
            units.append(dwsconv3x3_block(
                out_channels=out_channels, stride=stride,
                dw_use_bn=dw_use_bn, dw_activation=dw_activation,
                name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_mobilenet(width_scale: float, dws_simplified: bool = False, **kwargs):
    """Config expander (reference mobilenet.py:101)."""
    channels = [[32], [64], [128, 128], [256, 256],
                [512, 512, 512, 512, 512, 512], [1024, 1024]]
    if width_scale != 1.0:
        channels = [[int(cij * width_scale) for cij in ci] for ci in channels]
    if dws_simplified:
        dw_use_bn, dw_activation = False, None
    else:
        dw_use_bn, dw_activation = True, lambda_relu()
    return MobileNet(channels=channels, first_stage_stride=False,
                     dw_use_bn=dw_use_bn, dw_activation=dw_activation,
                     **kwargs)


def _variant(name, **cfg):
    @register_model(name)
    def ctor(**kwargs):
        return get_mobilenet(**cfg, **kwargs)
    ctor.__name__ = name
    return ctor


mobilenet_w1 = _variant("mobilenet_w1", width_scale=1.0)
mobilenet_w3d4 = _variant("mobilenet_w3d4", width_scale=0.75)
mobilenet_wd2 = _variant("mobilenet_wd2", width_scale=0.5)
mobilenet_wd4 = _variant("mobilenet_wd4", width_scale=0.25)

# MobileNet(B): simplified dws block (reference mobilenetb.py:13-102)
mobilenetb_w1 = _variant("mobilenetb_w1", width_scale=1.0,
                         dws_simplified=True)
mobilenetb_w3d4 = _variant("mobilenetb_w3d4", width_scale=0.75,
                           dws_simplified=True)
mobilenetb_wd2 = _variant("mobilenetb_wd2", width_scale=0.5,
                          dws_simplified=True)
mobilenetb_wd4 = _variant("mobilenetb_wd4", width_scale=0.25,
                          dws_simplified=True)


def get_fdmobilenet(width_scale: float, **kwargs):
    """FD-MobileNet: fast-downsampling channel plan
    (reference fdmobilenet.py:14)."""
    channels = [[32], [64], [128, 128], [256, 256],
                [512, 512, 512, 512, 512, 1024]]
    if width_scale != 1.0:
        channels = [[int(cij * width_scale) for cij in ci] for ci in channels]
    return MobileNet(channels=channels, first_stage_stride=True, **kwargs)


def _fd_variant(name, width_scale):
    @register_model(name)
    def ctor(**kwargs):
        return get_fdmobilenet(width_scale=width_scale, **kwargs)
    ctor.__name__ = name
    return ctor


fdmobilenet_w1 = _fd_variant("fdmobilenet_w1", 1.0)
fdmobilenet_w3d4 = _fd_variant("fdmobilenet_w3d4", 0.75)
fdmobilenet_wd2 = _fd_variant("fdmobilenet_wd2", 0.5)
fdmobilenet_wd4 = _fd_variant("fdmobilenet_wd4", 0.25)
