"""RiR (ResNet-in-ResNet) for CIFAR/SVHN, TPU-native. Behavioral reference:
pytorchcv ``models/rir_cifar.py`` (PostActivation:13, RiRUnit:38,
RiRInitBlock:106, RiRFinalBlock:137, CIFARRiR:152, get_rir_cifar:231)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (BatchNorm, DualPathSequential, Sequential, conv1x1,
                  conv1x1_block, conv3x3, conv3x3_block, global_avg_pool2d)
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["CIFARRiR", "get_rir_cifar"]


class _PostActivation(nn.Module):
    """BN + ReLU (reference rir_cifar.py:13)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(name="bn")(x, train=train)
        return nn.relu(x)


class RiRUnit(nn.Module):
    """Dual-stream residual-in-residual unit (reference rir_cifar.py:38)."""

    out_channels: int = 0
    stride: int = 1

    @nn.compact
    def __call__(self, x_res, x_trans, train: bool = False):
        in_channels = x_res.shape[-1]
        resize_identity = (in_channels != self.out_channels) or \
            (self.stride != 1)
        if resize_identity:
            x_res_identity = conv1x1(out_channels=self.out_channels,
                                     stride=self.stride,
                                     name="identity_conv")(x_res)
        else:
            x_res_identity = x_res
        y_res = conv3x3(out_channels=self.out_channels, stride=self.stride,
                        name="res_cross_conv")(x_res)
        y_trans = conv3x3(out_channels=self.out_channels, stride=self.stride,
                          name="trans_cross_conv")(x_trans)
        x_res = conv3x3(out_channels=self.out_channels, stride=self.stride,
                        name="res_pass_conv")(x_res)
        x_trans = conv3x3(out_channels=self.out_channels, stride=self.stride,
                          name="trans_pass_conv")(x_trans)
        x_res = x_res + x_res_identity + y_trans
        x_trans = x_trans + y_res
        x_res = _PostActivation(name="res_postactiv")(x_res, train=train)
        x_trans = _PostActivation(name="trans_postactiv")(x_trans,
                                                          train=train)
        return x_res, x_trans


class RiRInitBlock(nn.Module):
    """Dual 3x3 stem (reference rir_cifar.py:106)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, _, train: bool = False):
        x_res = conv3x3_block(out_channels=self.out_channels,
                              name="res_conv")(x, train=train)
        x_trans = conv3x3_block(out_channels=self.out_channels,
                                name="trans_conv")(x, train=train)
        return x_res, x_trans


class RiRFinalBlock(nn.Module):
    """Concat the two streams (reference rir_cifar.py:137)."""

    @nn.compact
    def __call__(self, x_res, x_trans, train: bool = False):
        return jnp.concatenate([x_res, x_trans], axis=-1), None


class RiROutput(nn.Module):
    """1x1 conv head + pool (reference rir_cifar.py:196-203)."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv1x1_block(out_channels=self.num_classes, activation=None,
                          name="final_conv")(x, train=train)
        return x.mean(axis=(1, 2), keepdims=True)


def CIFARRiR(channels, init_block_channels: int, final_block_channels: int,
             in_channels: int = 3, in_size: Tuple[int, int] = (32, 32),
             num_classes: int = 10) -> ImageClassifier:
    """CIFAR RiR (reference rir_cifar.py:152)."""
    layers = [RiRInitBlock(out_channels=init_block_channels,
                           name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(RiRUnit(out_channels=out_channels, stride=stride,
                                 name=f"unit{j + 1}", parent=None))
        layers.append(DualPathSequential(layers=tuple(units),
                                         name=f"stage{i + 1}"))
    layers.append(RiRFinalBlock(name="final_block"))
    features = DualPathSequential(layers=tuple(layers), return_two=False,
                                  first_ordinals=0, last_ordinals=0,
                                  name="features")
    return ImageClassifier(
        features=features,
        output=RiROutput(num_classes=num_classes, name="output"),
        output_before_flatten=True,
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_rir_cifar(num_classes: int, **kwargs):
    """Config expander (reference rir_cifar.py:231)."""
    assert num_classes in (10, 100)
    channels = [[48, 48, 48, 48], [96, 96, 96, 96, 96, 96],
                [192, 192, 192, 192, 192, 192]]
    return CIFARRiR(channels=channels, init_block_channels=48,
                    final_block_channels=384, num_classes=num_classes,
                    **kwargs)


for _ds, _classes in [("cifar10", 10), ("cifar100", 100), ("svhn", 10)]:
    _name = f"rir_{_ds}"

    def _make(classes=_classes):
        def ctor(num_classes: int = classes, **kwargs):
            return get_rir_cifar(num_classes=num_classes, **kwargs)
        return ctor
    _ctor = _make()
    _ctor.__name__ = _name
    register_model(_name)(_ctor)
