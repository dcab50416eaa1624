"""HRNet, TPU-native. Behavioral reference: pytorchcv ``models/hrnet.py``
(UpSamplingBlock:15, HRBlock:48, HRStage:127, HRInitBlock:210,
HRFinalBlock:255, HRNet:295, get_hrnet:382). N parallel resolutions with a
full cross-resolution fuse matrix per block — all static-shape convs +
nearest upsampling, so the whole multi-branch graph compiles flat.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (Identity, Sequential, conv1x1_block, conv3x3_block,
                  global_avg_pool2d, interpolate)
from ..nn.base import dense_kernel_init
from .registry import register_model
from .resnet import ResUnit
from .shell import ImageClassifier

__all__ = ["HRNet", "get_hrnet"]


class UpSamplingBlock(nn.Module):
    """1x1 conv block (no act) + nearest upsample
    (reference hrnet.py:15)."""

    out_channels: int = 0
    scale_factor: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv1x1_block(out_channels=self.out_channels, activation=None,
                          name="conv")(x, train=train)
        h, w = x.shape[1:3]
        return interpolate(x, (h * self.scale_factor, w * self.scale_factor),
                           mode="nearest")


class HRBlock(nn.Module):
    """Per-branch ResUnits + full cross-resolution fuse
    (reference hrnet.py:48)."""

    out_channels_list: Sequence[int] = ()
    num_branches: int = 1
    num_subblocks: Sequence[int] = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        nb = self.num_branches
        outs = []
        for i in range(nb):
            xi = x[i]
            units = [ResUnit(out_channels=self.out_channels_list[i],
                             stride=1, bottleneck=False,
                             name=f"unit{j + 1}", parent=None)
                     for j in range(self.num_subblocks[i])]
            xi = Sequential(layers=tuple(units),
                            name=f"branches.branch{i + 1}")(xi, train=train)
            outs.append(xi)
        if nb == 1:
            return outs

        chs = list(self.out_channels_list)
        x_fuse = []
        for i in range(nb):
            terms = []
            for j in range(nb):
                xj = outs[j]
                if j == i:
                    terms.append(xj)
                elif j > i:
                    terms.append(UpSamplingBlock(
                        out_channels=chs[i], scale_factor=2 ** (j - i),
                        name=f"fuse_layers.layer{i + 1}.block{j + 1}")(
                            xj, train=train))
                else:
                    sub = []
                    for k in range(i - j):
                        last = (k == i - j - 1)
                        sub.append(conv3x3_block(
                            out_channels=chs[i] if last else chs[j],
                            stride=2,
                            activation=None if last else "relu",
                            name=f"subblock{k + 1}", parent=None))
                    terms.append(Sequential(
                        layers=tuple(sub),
                        name=f"fuse_layers.layer{i + 1}.block{j + 1}")(
                            xj, train=train))
            y = terms[0]
            for t in terms[1:]:
                y = y + t
            x_fuse.append(nn.relu(y))
        return x_fuse


class HRStage(nn.Module):
    """Transition to new branch count + stack of HRBlocks
    (reference hrnet.py:127)."""

    in_branches: int = 1
    out_channels_list: Sequence[int] = ()
    in_channels_list: Sequence[int] = ()
    num_modules: int = 1
    num_branches: int = 1
    num_subblocks: Sequence[int] = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        is_list = isinstance(x, (list, tuple))
        x_list = []
        for i in range(self.num_branches):
            if i < self.in_branches:
                if self.out_channels_list[i] != self.in_channels_list[i]:
                    xi = conv3x3_block(
                        out_channels=self.out_channels_list[i], stride=1,
                        name=f"transition.block{i + 1}")(
                            x[-1] if is_list else x, train=train)
                else:
                    xi = x[i] if is_list else x
            else:
                sub = []
                for j in range(i + 1 - self.in_branches):
                    out_ch = (self.out_channels_list[i]
                              if j == i - self.in_branches
                              else self.in_channels_list[-1])
                    sub.append(conv3x3_block(out_channels=out_ch, stride=2,
                                             name=f"subblock{j + 1}",
                                             parent=None))
                xi = Sequential(layers=tuple(sub),
                                name=f"transition.block{i + 1}")(
                                    x[-1] if is_list else x, train=train)
            x_list.append(xi)
        y = x_list
        for m in range(self.num_modules):
            y = HRBlock(out_channels_list=self.out_channels_list,
                        num_branches=self.num_branches,
                        num_subblocks=self.num_subblocks,
                        name=f"layers.block{m + 1}")(y, train=train)
        return y


class HRInitBlock(nn.Module):
    """two conv/2 + bottleneck ResUnits (reference hrnet.py:210)."""

    out_channels: int = 0
    mid_channels: int = 64
    num_subblocks: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.mid_channels, stride=2,
                          name="conv1")(x, train=train)
        x = conv3x3_block(out_channels=self.mid_channels, stride=2,
                          name="conv2")(x, train=train)
        for i in range(self.num_subblocks):
            x = ResUnit(out_channels=self.out_channels, stride=1,
                        bottleneck=True,
                        name=f"subblocks.block{i + 1}")(x, train=train)
        return x


class HRFinalBlock(nn.Module):
    """Incremental bottlenecks + downsample merge + final 1x1
    (reference hrnet.py:255)."""

    out_channels_list: Sequence[int] = (128, 256, 512, 1024)

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ResUnit(out_channels=self.out_channels_list[0], stride=1,
                    bottleneck=True, name="inc_blocks.block1")(
                        x[0], train=train)
        for i in range(len(x) - 1):
            inc = ResUnit(out_channels=self.out_channels_list[i + 1],
                          stride=1, bottleneck=True,
                          name=f"inc_blocks.block{i + 2}")(
                              x[i + 1], train=train)
            down = conv3x3_block(out_channels=self.out_channels_list[i + 1],
                                 stride=2, bias=True,
                                 name=f"down_blocks.block{i + 1}")(
                                     y, train=train)
            y = inc + down
        return conv1x1_block(out_channels=2048, bias=True,
                             name="final_layer")(y, train=train)


class HRFeatures(nn.Module):
    """HRNet trunk (reference hrnet.py:337-358)."""

    channels: Sequence[Sequence[int]] = ()
    init_block_channels: int = 256
    init_num_subblocks: int = 1
    num_modules: Sequence[int] = ()
    num_subblocks: Sequence[Sequence[int]] = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        branches = [2, 3, 4]
        x = HRInitBlock(out_channels=self.init_block_channels,
                        mid_channels=64,
                        num_subblocks=self.init_num_subblocks,
                        name="init_block")(x, train=train)
        in_channels_list = [self.init_block_channels]
        y = x
        for i in range(len(branches)):
            y = HRStage(in_branches=len(in_channels_list),
                        out_channels_list=tuple(self.channels[i]),
                        in_channels_list=tuple(in_channels_list),
                        num_modules=self.num_modules[i],
                        num_branches=branches[i],
                        num_subblocks=tuple(self.num_subblocks[i]),
                        name=f"stage{i + 1}")(y, train=train)
            in_channels_list = list(self.channels[i])
        y = HRFinalBlock(name="final_block")(y, train=train)
        return jnp.mean(y, axis=(1, 2))


def HRNet(channels, init_block_channels: int, init_num_subblocks: int,
          num_modules, num_subblocks, in_channels: int = 3,
          in_size: Tuple[int, int] = (224, 224),
          num_classes: int = 1000) -> ImageClassifier:
    """HRNet (reference hrnet.py:295)."""
    return ImageClassifier(
        features=HRFeatures(
            channels=tuple(tuple(c) for c in channels),
            init_block_channels=init_block_channels,
            init_num_subblocks=init_num_subblocks,
            num_modules=tuple(num_modules),
            num_subblocks=tuple(tuple(s) for s in num_subblocks),
            name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_hrnet(version: str, **kwargs):
    """Config expander (reference hrnet.py:382)."""
    table = {
        "w18s1": (128, 1, [[16, 32], [16, 32, 64], [16, 32, 64, 128]],
                  [1, 1, 1]),
        "w18s2": (256, 2, [[18, 36], [18, 36, 72], [18, 36, 72, 144]],
                  [1, 3, 2]),
        "w18": (256, 4, [[18, 36], [18, 36, 72], [18, 36, 72, 144]],
                [1, 4, 3]),
        "w30": (256, 4, [[30, 60], [30, 60, 120], [30, 60, 120, 240]],
                [1, 4, 3]),
        "w32": (256, 4, [[32, 64], [32, 64, 128], [32, 64, 128, 256]],
                [1, 4, 3]),
        "w40": (256, 4, [[40, 80], [40, 80, 160], [40, 80, 160, 320]],
                [1, 4, 3]),
        "w44": (256, 4, [[44, 88], [44, 88, 176], [44, 88, 176, 352]],
                [1, 4, 3]),
        "w48": (256, 4, [[48, 96], [48, 96, 192], [48, 96, 192, 384]],
                [1, 4, 3]),
        "w64": (256, 4, [[64, 128], [64, 128, 256], [64, 128, 256, 512]],
                [1, 4, 3]),
    }
    if version not in table:
        raise ValueError(f"Unsupported HRNet version {version}")
    init_block_channels, init_num_subblocks, channels, num_modules = \
        table[version]
    num_subblocks = [[max(2, init_num_subblocks)] * len(ci)
                     for ci in channels]
    return HRNet(channels=channels, init_block_channels=init_block_channels,
                 init_num_subblocks=init_num_subblocks,
                 num_modules=num_modules, num_subblocks=num_subblocks,
                 **kwargs)


def _variant(name, version):
    @register_model(name)
    def ctor(**kwargs):
        return get_hrnet(version=version, **kwargs)
    ctor.__name__ = name
    return ctor


hrnet_w18_small_v1 = _variant("hrnet_w18_small_v1", "w18s1")
hrnet_w18_small_v2 = _variant("hrnet_w18_small_v2", "w18s2")
hrnetv2_w18 = _variant("hrnetv2_w18", "w18")
hrnetv2_w30 = _variant("hrnetv2_w30", "w30")
hrnetv2_w32 = _variant("hrnetv2_w32", "w32")
hrnetv2_w40 = _variant("hrnetv2_w40", "w40")
hrnetv2_w44 = _variant("hrnetv2_w44", "w44")
hrnetv2_w48 = _variant("hrnetv2_w48", "w48")
hrnetv2_w64 = _variant("hrnetv2_w64", "w64")
