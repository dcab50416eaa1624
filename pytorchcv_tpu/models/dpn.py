"""DPN (Dual Path Networks), TPU-native. Behavioral reference: pytorchcv
``models/dpn.py`` (GlobalAvgMaxPool2D:15, dpn_batch_norm:37, DPNConv:70,
DPNUnit:168, DPNInitBlock:258, DPNFinalBlock:300, DPN:320, get_dpn:440).
Dual path = residual stream + growing dense stream, carried as a tuple
through ``DualPathSequential``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (BatchNorm, DualPathSequential, Sequential, avg_pool2d,
                  conv1x1, max_pool2d)
from ..nn.base import IntPair
from ..nn.conv import _conv2d
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["DPN", "DPNUnit", "get_dpn"]

_DPN_BN_EPS = 0.001


class DPNConv(nn.Module):
    """BN -> ReLU -> conv (reference dpn.py:70)."""

    out_channels: int = 0
    kernel_size: IntPair = 1
    stride: IntPair = 1
    padding: IntPair = 0
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(epsilon=_DPN_BN_EPS, name="bn")(x, train=train)
        x = nn.relu(x)
        return _conv2d(self.out_channels, self.kernel_size, self.stride,
                       self.padding, groups=self.groups, name="conv")(x)


class PreActivation(nn.Module):
    """BN -> ReLU (reference dpn.py:50)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(epsilon=_DPN_BN_EPS, name="bn")(x, train=train)
        return nn.relu(x)


class DPNUnit(nn.Module):
    """Dual-path unit (reference dpn.py:168)."""

    mid_channels: int = 0
    bw: int = 0
    inc: int = 0
    groups: int = 1
    has_proj: bool = False
    key_stride: int = 1
    b_case: bool = False

    @nn.compact
    def __call__(self, x1, x2=None, train: bool = False):
        x_in = jnp.concatenate([x1, x2], axis=-1) if x2 is not None else x1
        if self.has_proj:
            x_s = DPNConv(out_channels=self.bw + 2 * self.inc,
                          kernel_size=1, stride=self.key_stride,
                          name="conv_proj")(x_in, train=train)
            x_s1 = x_s[..., :self.bw]
            x_s2 = x_s[..., self.bw:]
        else:
            assert x2 is not None
            x_s1, x_s2 = x1, x2
        y = DPNConv(out_channels=self.mid_channels, kernel_size=1,
                    name="conv1")(x_in, train=train)
        y = DPNConv(out_channels=self.mid_channels, kernel_size=3,
                    stride=self.key_stride, padding=1, groups=self.groups,
                    name="conv2")(y, train=train)
        if self.b_case:
            y = PreActivation(name="preactiv")(y, train=train)
            y1 = conv1x1(out_channels=self.bw, name="conv3a")(y)
            y2 = conv1x1(out_channels=self.inc, name="conv3b")(y)
        else:
            y = DPNConv(out_channels=self.bw + self.inc, kernel_size=1,
                        name="conv3")(y, train=train)
            y1 = y[..., :self.bw]
            y2 = y[..., self.bw:]
        residual = x_s1 + y1
        dense = jnp.concatenate([x_s2, y2], axis=-1)
        return residual, dense


class DPNInitBlock(nn.Module):
    """conv/2 + BN + ReLU + maxpool (reference dpn.py:258)."""

    out_channels: int = 0
    kernel_size: int = 7
    padding: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv2d(self.out_channels, self.kernel_size, 2, self.padding,
                    name="conv")(x)
        x = BatchNorm(epsilon=_DPN_BN_EPS, name="bn")(x, train=train)
        x = nn.relu(x)
        return max_pool2d(3, 2, 1)(x)


class DPNFinalBlock(nn.Module):
    """concat + preactivation, collapsing the dual path
    (reference dpn.py:300)."""

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        assert x2 is not None
        x = jnp.concatenate([x1, x2], axis=-1)
        return PreActivation(name="activ")(x, train=train), None


class DPNOutput(nn.Module):
    """Inference head: avgpool7 -> conv classifier -> avg+max pool
    (reference dpn.py:407-422); training head is global-avg + conv."""

    num_classes: int = 1000
    test_time_pool: bool = True
    for_training: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.for_training or not self.test_time_pool:
            x = jnp.mean(x, axis=(1, 2), keepdims=True)
            return conv1x1(out_channels=self.num_classes, bias=True,
                           name="classifier")(x)
        x = avg_pool2d(7, 1, 0)(x)
        x = conv1x1(out_channels=self.num_classes, bias=True,
                    name="classifier")(x)
        x_avg = jnp.mean(x, axis=(1, 2), keepdims=True)
        x_max = jnp.max(x, axis=(1, 2), keepdims=True)
        return 0.5 * (x_avg + x_max)


def DPN(channels, init_block_channels: int, init_block_kernel_size: int,
        init_block_padding: int, rs, bws, incs, groups: int, b_case: bool,
        for_training: bool, test_time_pool: bool, in_channels: int = 3,
        in_size: Tuple[int, int] = (224, 224),
        num_classes: int = 1000) -> ImageClassifier:
    """DPN (reference dpn.py:320)."""
    layers = [DPNInitBlock(out_channels=init_block_channels,
                           kernel_size=init_block_kernel_size,
                           padding=init_block_padding, name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, _ in enumerate(channels_per_stage):
            units.append(DPNUnit(
                mid_channels=rs[i], bw=bws[i], inc=incs[i], groups=groups,
                has_proj=(j == 0),
                key_stride=2 if (j == 0) and (i != 0) else 1,
                b_case=b_case, name=f"unit{j + 1}"))
        layers.append(DualPathSequential(layers=tuple(units),
                                         name=f"stage{i + 1}"))
    layers.append(DPNFinalBlock(name="final_block"))
    features = DualPathSequential(layers=tuple(layers), return_two=False,
                                  first_ordinals=1, last_ordinals=0,
                                  name="features")
    return ImageClassifier(
        features=features,
        output=DPNOutput(num_classes=num_classes,
                         test_time_pool=test_time_pool,
                         for_training=for_training, name="output"),
        output_before_flatten=True,
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_dpn(num_layers: int, b_case: bool = False,
            for_training: bool = False, **kwargs):
    """Config expander (reference dpn.py:440)."""
    table = {
        68: (10, 3, 1, 1, 128, 32, (3, 4, 12, 3), (16, 32, 32, 64)),
        98: (96, 7, 3, 4, 160, 40, (3, 6, 20, 3), (16, 32, 32, 128)),
        107: (128, 7, 3, 4, 200, 50, (4, 8, 20, 3), (20, 64, 64, 128)),
        131: (128, 7, 3, 4, 160, 40, (4, 8, 28, 3), (16, 32, 32, 128)),
    }
    if num_layers not in table:
        raise ValueError(f"Unsupported DPN layers: {num_layers}")
    (init_block_channels, init_block_kernel_size, init_block_padding,
     bw_factor, k_r, groups, k_sec, incs) = table[num_layers]

    channels = [[0] * li for li in k_sec]
    rs = [0] * len(k_sec)
    bws = [0] * len(k_sec)
    for i in range(len(k_sec)):
        rs[i] = (2 ** i) * k_r
        bws[i] = (2 ** i) * 64 * bw_factor
        channels[i][0] = bws[i] + 3 * incs[i]
        for j in range(1, k_sec[i]):
            channels[i][j] = channels[i][j - 1] + incs[i]

    return DPN(channels=channels, init_block_channels=init_block_channels,
               init_block_kernel_size=init_block_kernel_size,
               init_block_padding=init_block_padding, rs=rs, bws=bws,
               incs=incs, groups=groups, b_case=b_case,
               for_training=for_training, test_time_pool=True, **kwargs)


def _variant(name, num_layers, b_case=False):
    @register_model(name)
    def ctor(**kwargs):
        return get_dpn(num_layers=num_layers, b_case=b_case, **kwargs)
    ctor.__name__ = name
    return ctor


dpn68 = _variant("dpn68", 68)
dpn68b = _variant("dpn68b", 68, b_case=True)
dpn98 = _variant("dpn98", 98)
dpn107 = _variant("dpn107", 107)
dpn131 = _variant("dpn131", 131)
