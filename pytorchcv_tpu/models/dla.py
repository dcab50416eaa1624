"""DLA (Deep Layer Aggregation), TPU-native. Behavioral reference: pytorchcv
``models/dla.py`` (DLABottleneck:14, DLABottleneckX:41, DLAResBlock:72,
DLARoot:133, DLATree:170, DLAInitBlock:276, DLA:311, get_dla:385).

The recursive tree is unrolled at build time (levels are small static
ints), so XLA sees a flat graph of conv blocks."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (Sequential, conv1x1, conv1x1_block, conv3x3_block,
                  conv7x7_block, global_avg_pool2d, max_pool2d)
from .registry import register_model
from .resnet import ResBlock, ResBottleneck
from .resnext import ResNeXtBottleneck
from .shell import ImageClassifier

__all__ = ["DLA", "get_dla"]


def _make_body(body_class, out_channels, stride, name):
    if body_class == "res":
        return ResBlock(out_channels=out_channels, stride=stride, name=name,
                        parent=None)
    if body_class == "bottleneck":
        return ResBottleneck(out_channels=out_channels, stride=stride,
                             bottleneck_factor=2, name=name, parent=None)
    if body_class == "bottleneckx":
        return ResNeXtBottleneck(out_channels=out_channels, stride=stride,
                                 cardinality=32, bottleneck_width=8,
                                 name=name, parent=None)
    if body_class == "bottleneckx64":
        return ResNeXtBottleneck(out_channels=out_channels, stride=stride,
                                 cardinality=64, bottleneck_width=8,
                                 name=name, parent=None)
    raise ValueError(body_class)


class DLAResBlock(nn.Module):
    """Residual block with max-pool downsample + projection identity
    (reference dla.py:72)."""

    out_channels: int = 0
    stride: int = 1
    body_class: str = "res"
    return_down: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        downsample = self.stride > 1
        project = x.shape[-1] != self.out_channels
        down = max_pool2d(self.stride, self.stride)(x) if downsample else x
        if project:
            identity = conv1x1_block(
                out_channels=self.out_channels, activation=None,
                name="project_conv")(down, train=train)
        else:
            identity = down
        body = _make_body(self.body_class, self.out_channels, self.stride,
                          "body")
        y = body.clone(parent=self)(x, train=train)
        y = nn.relu(y + identity)
        if self.return_down:
            return y, down
        return y


class DLARoot(nn.Module):
    """Aggregation root (reference dla.py:133)."""

    out_channels: int = 0
    residual: bool = False

    @nn.compact
    def __call__(self, x2, x1, extra, train: bool = False):
        last_branch = x2
        x = jnp.concatenate([x2, x1] + list(extra), axis=-1)
        x = conv1x1_block(out_channels=self.out_channels, activation=None,
                          name="conv")(x, train=train)
        if self.residual:
            x = x + last_branch
        return nn.relu(x)


class DLATree(nn.Module):
    """Recursive aggregation tree (reference dla.py:170)."""

    levels: int = 1
    out_channels: int = 0
    body_class: str = "res"
    stride: int = 1
    root_residual: bool = False
    root_dim: int = 0
    first_tree: bool = False
    input_level: bool = True
    return_down: bool = False

    @nn.compact
    def __call__(self, x, extra=None, train: bool = False):
        add_down = self.input_level and not self.first_tree
        root_level = (self.levels == 1)
        root_dim = 2 * self.out_channels if self.root_dim == 0 \
            else self.root_dim
        if add_down:
            root_dim += x.shape[-1]
        extra = [] if extra is None else extra
        if root_level:
            x1, down = DLAResBlock(
                out_channels=self.out_channels, stride=self.stride,
                body_class=self.body_class, return_down=True,
                name="tree1")(x, train=train)
        else:
            x1, down = DLATree(
                levels=self.levels - 1, out_channels=self.out_channels,
                body_class=self.body_class, stride=self.stride,
                root_residual=self.root_residual, root_dim=0,
                input_level=False, return_down=True,
                name="tree1")(x, train=train)
        if add_down:
            extra.append(down)
        if root_level:
            x2 = DLAResBlock(
                out_channels=self.out_channels, stride=1,
                body_class=self.body_class,
                name="tree2")(x1, train=train)
            out = DLARoot(out_channels=self.out_channels,
                          residual=self.root_residual,
                          name="root")(x2, x1, extra, train=train)
        else:
            extra.append(x1)
            out = DLATree(
                levels=self.levels - 1, out_channels=self.out_channels,
                body_class=self.body_class, stride=1,
                root_residual=self.root_residual,
                root_dim=root_dim + self.out_channels, input_level=False,
                name="tree2")(x1, extra, train=train)
        if self.return_down:
            return out, down
        return out


class DLAInitBlock(nn.Module):
    """7x7 + 3x3 + strided 3x3 stem (reference dla.py:276)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = self.out_channels // 2
        x = conv7x7_block(out_channels=mid_channels,
                          name="conv1")(x, train=train)
        x = conv3x3_block(out_channels=mid_channels,
                          name="conv2")(x, train=train)
        x = conv3x3_block(out_channels=self.out_channels, stride=2,
                          name="conv3")(x, train=train)
        return x


def DLA(levels, channels, init_block_channels: int, res_body_class: str,
        residual_root: bool = False, in_channels: int = 3,
        in_size: Tuple[int, int] = (224, 224),
        num_classes: int = 1000) -> ImageClassifier:
    """DLA (reference dla.py:311)."""
    layers = [DLAInitBlock(out_channels=init_block_channels,
                           name="init_block")]
    for i in range(len(levels)):
        layers.append(DLATree(
            levels=levels[i], out_channels=channels[i],
            body_class=res_body_class, stride=2,
            root_residual=residual_root, first_tree=(i == 0),
            name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d(keepdims=True))
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=conv1x1(out_channels=num_classes, bias=True, name="output"),
        output_before_flatten=True,
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_dla(levels, channels, res_body_class, residual_root=False, **kwargs):
    """Config expander (reference dla.py:385)."""
    return DLA(levels=levels, channels=channels, init_block_channels=32,
               res_body_class=res_body_class, residual_root=residual_root,
               **kwargs)


_DLA_VARIANTS = {
    "dla34": ([1, 2, 2, 1], [64, 128, 256, 512], "res", False),
    "dla46c": ([1, 2, 2, 1], [64, 64, 128, 256], "bottleneck", False),
    "dla46xc": ([1, 2, 2, 1], [64, 64, 128, 256], "bottleneckx", False),
    "dla60": ([1, 2, 3, 1], [128, 256, 512, 1024], "bottleneck", False),
    "dla60x": ([1, 2, 3, 1], [128, 256, 512, 1024], "bottleneckx", False),
    "dla60xc": ([1, 2, 3, 1], [64, 64, 128, 256], "bottleneckx", False),
    "dla102": ([1, 3, 4, 1], [128, 256, 512, 1024], "bottleneck", True),
    "dla102x": ([1, 3, 4, 1], [128, 256, 512, 1024], "bottleneckx", True),
    "dla102x2": ([1, 3, 4, 1], [128, 256, 512, 1024], "bottleneckx64", True),
    "dla169": ([2, 3, 5, 1], [128, 256, 512, 1024], "bottleneck", True),
}

for _name, _cfg in _DLA_VARIANTS.items():
    def _make(cfg=_cfg):
        def ctor(**kwargs):
            return get_dla(levels=cfg[0], channels=cfg[1],
                           res_body_class=cfg[2], residual_root=cfg[3],
                           **kwargs)
        return ctor
    _ctor = _make()
    _ctor.__name__ = _name
    register_model(_name)(_ctor)
