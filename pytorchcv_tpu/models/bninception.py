"""BN-Inception, TPU-native. Behavioral reference: pytorchcv
``models/bninception.py`` (Inception3x3Branch:17, InceptionDouble3x3Branch:62,
InceptionPoolBranch:113, StemBlock:162, InceptionBlock:216, ReductionBlock:275,
BNInception:328, get_bninception:425)."""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import (Concurrent, Sequential, avg_pool2d, conv1x1_block,
                  conv3x3_block, conv7x7_block, global_avg_pool2d, max_pool2d)
from ..nn.base import dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["BNInception", "get_bninception"]


def _branch3x3(out_channels, mid_channels, stride=1, name="branch",
               bound=False):
    """1x1 -> 3x3 branch (reference bninception.py:17).

    ``bound=False`` leaves the Sequential unbound (for use inside a
    container's ``layers`` tuple); ``bound=True`` auto-binds it to the
    enclosing compact scope."""
    kw = {} if bound else {"parent": None}
    return Sequential(layers=(
        conv1x1_block(out_channels=mid_channels, bias=True, name="conv1",
                      parent=None),
        conv3x3_block(out_channels=out_channels, stride=stride, bias=True,
                      name="conv2", parent=None),
    ), name=name, **kw)


def _branch_double3x3(out_channels, mid_channels, stride=1, name="branch"):
    """1x1 -> 3x3 -> 3x3 branch (reference bninception.py:62)."""
    return Sequential(layers=(
        conv1x1_block(out_channels=mid_channels, bias=True, name="conv1",
                      parent=None),
        conv3x3_block(out_channels=out_channels, bias=True, name="conv2",
                      parent=None),
        conv3x3_block(out_channels=out_channels, stride=stride, bias=True,
                      name="conv3", parent=None),
    ), name=name, parent=None)


class InceptionPoolBranch(nn.Module):
    """Pool -> 1x1 conv branch (reference bninception.py:113)."""

    out_channels: int = 0
    avg_pool: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.avg_pool:
            x = avg_pool2d(3, 1, padding=1, ceil_mode=True,
                           count_include_pad=True)(x)
        else:
            x = max_pool2d(3, 1, padding=1, ceil_mode=True)(x)
        x = conv1x1_block(out_channels=self.out_channels, bias=True,
                          name="conv")(x, train=train)
        return x


class StemBlock(nn.Module):
    """7x7 stem + 3x3 branch with max pools (reference bninception.py:162)."""

    out_channels: int = 0
    mid_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv7x7_block(out_channels=self.mid_channels, stride=2, bias=True,
                          name="conv1")(x, train=train)
        x = max_pool2d(3, 2, ceil_mode=True)(x)
        x = _branch3x3(self.out_channels, self.mid_channels,
                       name="conv2", bound=True)(x, train=train)
        x = max_pool2d(3, 2, ceil_mode=True)(x)
        return x


class InceptionBlock(nn.Module):
    """4-branch inception unit (reference bninception.py:216)."""

    mid1: Tuple[int, ...] = ()
    mid2: Tuple[int, ...] = ()
    avg_pool: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        return Concurrent(layers=(
            conv1x1_block(out_channels=self.mid2[0], bias=True,
                          name="branch1", parent=None),
            _branch3x3(self.mid2[1], self.mid1[0], name="branch2"),
            _branch_double3x3(self.mid2[2], self.mid1[1], name="branch3"),
            InceptionPoolBranch(out_channels=self.mid2[3],
                                avg_pool=self.avg_pool, name="branch4",
                                parent=None),
        ), name="branches")(x, train=train)


class ReductionBlock(nn.Module):
    """Strided 3-branch reduction unit (reference bninception.py:275)."""

    mid1: Tuple[int, ...] = ()
    mid2: Tuple[int, ...] = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        return Concurrent(layers=(
            _branch3x3(self.mid2[1], self.mid1[0], stride=2, name="branch1"),
            _branch_double3x3(self.mid2[2], self.mid1[1], stride=2,
                              name="branch2"),
            max_pool2d(3, 2, ceil_mode=True),
        ), name="branches")(x, train=train)


def BNInception(channels, init_block_channels_list, mid1_channels_list,
                mid2_channels_list, in_channels: int = 3,
                in_size: Tuple[int, int] = (224, 224),
                num_classes: int = 1000) -> ImageClassifier:
    """BN-Inception (reference bninception.py:328)."""
    layers = [StemBlock(out_channels=init_block_channels_list[1],
                        mid_channels=init_block_channels_list[0],
                        name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j in range(len(channels_per_stage)):
            if (j == 0) and (i != 0):
                units.append(ReductionBlock(
                    mid1=tuple(mid1_channels_list[i][j]),
                    mid2=tuple(mid2_channels_list[i][j]),
                    name=f"unit{j + 1}"))
            else:
                avg_pool = (i != len(channels) - 1) or \
                    (j != len(channels_per_stage) - 1)
                units.append(InceptionBlock(
                    mid1=tuple(mid1_channels_list[i][j]),
                    mid2=tuple(mid2_channels_list[i][j]),
                    avg_pool=avg_pool, name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_bninception(**kwargs):
    """Config expander (reference bninception.py:425)."""
    init_block_channels_list = [64, 192]
    channels = [[256, 320], [576, 576, 576, 608, 608], [1056, 1024, 1024]]
    mid1_channels_list = [
        [[64, 64], [64, 64]],
        [[128, 64], [64, 96], [96, 96], [128, 128], [128, 160]],
        [[128, 192], [192, 160], [192, 192]],
    ]
    mid2_channels_list = [
        [[64, 64, 96, 32], [64, 96, 96, 64]],
        [[0, 160, 96, 0], [224, 96, 128, 128], [192, 128, 128, 128],
         [160, 160, 160, 128], [96, 192, 192, 128]],
        [[0, 192, 256, 0], [352, 320, 224, 128], [352, 320, 224, 128]],
    ]
    return BNInception(channels=channels,
                       init_block_channels_list=init_block_channels_list,
                       mid1_channels_list=mid1_channels_list,
                       mid2_channels_list=mid2_channels_list, **kwargs)


@register_model("bninception")
def bninception(**kwargs):
    return get_bninception(**kwargs)
