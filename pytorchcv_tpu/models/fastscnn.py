"""Fast-SCNN, TPU-native. Behavioral reference: pytorchcv
``models/fastscnn.py`` (Stem:14, LinearBottleneck:57, FeatureExtractor:102,
PoolingBranch:138, FastPyramidPooling:185, FeatureFusion:226, Head:288,
AuxHead:330, FastSCNN:367, fastscnn_cityscapes:490)."""

from __future__ import annotations

from typing import Optional, Tuple

from flax import linen as nn

from ..nn import (Concurrent, Identity, InterpolationBlock, Sequential,
                  adaptive_avg_pool2d, conv1x1, conv1x1_block, conv3x3_block,
                  dwconv3x3_block, dwsconv3x3_block)
from ..nn.base import Composed
from .registry import register_model

__all__ = ["FastSCNN", "get_fastscnn"]


class Stem(nn.Module):
    """Learning-to-downsample stem (reference fastscnn.py:14)."""

    channels: Tuple[int, int, int] = (32, 48, 64)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.channels[0], stride=2, padding=0,
                          name="conv1")(x, train=train)
        x = dwsconv3x3_block(out_channels=self.channels[1], stride=2,
                             name="conv2")(x, train=train)
        return dwsconv3x3_block(out_channels=self.channels[2], stride=2,
                                name="conv3")(x, train=train)


class LinearBottleneck(nn.Module):
    """MobileNetV2-style bottleneck (reference fastscnn.py:57)."""

    out_channels: int = 0
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        residual = (in_channels == self.out_channels) and (self.stride == 1)
        identity = x
        mid_channels = in_channels * 6
        x = conv1x1_block(out_channels=mid_channels,
                          name="conv1")(x, train=train)
        x = dwconv3x3_block(out_channels=mid_channels, stride=self.stride,
                            name="conv2")(x, train=train)
        x = conv1x1_block(out_channels=self.out_channels, activation=None,
                          name="conv3")(x, train=train)
        if residual:
            x = x + identity
        return x


class PoolingBranch(nn.Module):
    """Adaptive pool + 1x1 + upsample (reference fastscnn.py:138)."""

    out_channels: int = 0
    in_size: Optional[Tuple[int, int]] = None
    down_size: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_size = self.in_size if self.in_size is not None else x.shape[1:3]
        x = adaptive_avg_pool2d(self.down_size)(x)
        x = conv1x1_block(out_channels=self.out_channels,
                          name="conv")(x, train=train)
        return InterpolationBlock()(x, size=in_size)


class FastPyramidPooling(nn.Module):
    """4-scale pooling pyramid (reference fastscnn.py:185)."""

    out_channels: int = 0
    in_size: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = x.shape[-1] // 4
        branches = [Identity()]
        for i, down_size in enumerate([1, 2, 3, 6]):
            branches.append(PoolingBranch(
                out_channels=mid_channels, in_size=self.in_size,
                down_size=down_size, name=f"branch{i + 2}", parent=None))
        x = Concurrent(layers=tuple(branches),
                       name="branches")(x, train=train)
        return conv1x1_block(out_channels=self.out_channels,
                             name="conv")(x, train=train)


class FeatureFusion(nn.Module):
    """High/low resolution feature fusion (reference fastscnn.py:226)."""

    out_channels: int = 0
    x_in_size: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, x, y, train: bool = False):
        x_in_size = self.x_in_size if self.x_in_size is not None \
            else x.shape[1:3]
        y = InterpolationBlock()(y, size=x_in_size)
        y = dwconv3x3_block(out_channels=self.out_channels,
                            name="low_dw_conv")(y, train=train)
        y = conv1x1_block(out_channels=self.out_channels, bias=True,
                          activation=None, name="low_pw_conv")(y, train=train)
        x = conv1x1_block(out_channels=self.out_channels, bias=True,
                          activation=None, name="high_conv")(x, train=train)
        return nn.relu(x + y)


class FastSCNNHead(nn.Module):
    """Classifier head (reference fastscnn.py:288)."""

    num_classes: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        x = dwsconv3x3_block(out_channels=in_channels,
                             name="conv1")(x, train=train)
        x = dwsconv3x3_block(out_channels=in_channels,
                             name="conv2")(x, train=train)
        if train:
            x = nn.Dropout(rate=0.1, deterministic=False)(x)
        return conv1x1(out_channels=self.num_classes, bias=True,
                       name="conv3")(x)


class FastSCNNAuxHead(nn.Module):
    """Aux classifier (reference fastscnn.py:330)."""

    mid_channels: int = 64
    num_classes: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.mid_channels,
                          name="conv1")(x, train=train)
        if train:
            x = nn.Dropout(rate=0.1, deterministic=False)(x)
        return conv1x1(out_channels=self.num_classes, bias=True,
                       name="conv2")(x)


class FastSCNN(Composed):
    """Fast-SCNN (reference fastscnn.py:367)."""

    aux: bool = False
    fixed_size: bool = True
    in_size: Tuple[int, int] = (1024, 1024)
    in_channels: int = 3
    num_classes: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_size = self.in_size if self.fixed_size else x.shape[1:3]
        stem_channels = (32, 48, 64)
        feature_channels = [[64, 64, 64], [96, 96, 96], [128, 128, 128]]
        x = Stem(channels=stem_channels, name="stem")(x, train=train)
        stages = []
        for i, cps in enumerate(feature_channels):
            units = [LinearBottleneck(
                out_channels=oc,
                stride=(2 if (j == 0) and (i != len(feature_channels) - 1)
                        else 1),
                name=f"unit{j + 1}", parent=None)
                for j, oc in enumerate(cps)]
            stages.append(Sequential(layers=tuple(units),
                                     name=f"stage{i + 1}", parent=None))
        y = FeaturesWrap(stages=tuple(stages), name="features")(x,
                                                                train=train)
        pool_out_size = (in_size[0] // 32, in_size[1] // 32) \
            if self.fixed_size else None
        y = FastPyramidPooling(out_channels=feature_channels[-1][-1],
                               in_size=pool_out_size,
                               name="pool")(y, train=train)
        fusion_out_size = (in_size[0] // 8, in_size[1] // 8) \
            if self.fixed_size else None
        y = FeatureFusion(out_channels=128, x_in_size=fusion_out_size,
                          name="fusion")(x, y, train=train)
        y = FastSCNNHead(num_classes=self.num_classes,
                         name="head")(y, train=train)
        y = InterpolationBlock()(y, size=in_size)
        if self.aux:
            a = FastSCNNAuxHead(mid_channels=64,
                                num_classes=self.num_classes,
                                name="aux_head")(x, train=train)
            a = InterpolationBlock()(a, size=in_size)
            return y, a
        return y


class FeaturesWrap(Composed):
    """``features.features`` nesting (reference FeatureExtractor holds its
    own inner ``features`` Sequential, fastscnn.py:102-136)."""

    stages: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return Sequential(layers=tuple(self.stages),
                          name="features")(x, train=train)


def get_fastscnn(**kwargs):
    """Config expander (reference fastscnn.py:455)."""
    return FastSCNN(**kwargs)


@register_model("fastscnn_cityscapes")
def fastscnn_cityscapes(num_classes: int = 19, aux: bool = True, **kwargs):
    return get_fastscnn(num_classes=num_classes, aux=aux, **kwargs)
