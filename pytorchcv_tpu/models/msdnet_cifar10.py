"""MSDNet for CIFAR-10, TPU-native (JAX/flax, NHWC).

Behavioral reference: pytorchcv ``models/msdnet_cifar10.py``
(CIFAR10MSDInitLayer:15, CIFAR10MSDClassifier:53, CIFAR10MSDNet:106,
get_msdnet_cifar10:197)."""

from __future__ import annotations

from typing import Any, Tuple

from flax import linen as nn

from ..nn import Sequential, avg_pool2d, conv3x3_block
from ..nn.arch import IndexedSeq
from ..nn.base import dense_kernel_init
from .msdnet import MSDFeatureBlock, msdnet_channels
from .registry import register_model

__all__ = ["CIFAR10MSDNet", "get_msdnet_cifar10"]


class CIFAR10MSDInitLayer(nn.Module):
    """Initial multi-scale pyramid for 32x32 inputs (reference
    msdnet_cifar10.py:15)."""

    out_channels: Any = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        blocks = tuple(conv3x3_block(out_channels=oc,
                                     stride=(1 if i == 0 else 2),
                                     name=f"scale_block{i + 1}",
                                     parent=None)
                       for i, oc in enumerate(self.out_channels))
        seq = IndexedSeq(layers=blocks, name="scale_blocks")
        outs = []
        for i in range(len(blocks)):
            x = seq(x, i, train=train)
            outs.append(x)
        return outs


class CIFAR10MSDClassifier(nn.Module):
    """Exit head with fixed 128 mid channels (reference
    msdnet_cifar10.py:53)."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = 128
        x = Sequential(layers=(
            conv3x3_block(out_channels=mid_channels, stride=2, name="conv1",
                          parent=None),
            conv3x3_block(out_channels=mid_channels, stride=2, name="conv2",
                          parent=None),
            avg_pool2d(kernel_size=2, stride=2),
        ), name="features")(x, train=train)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.num_classes, kernel_init=dense_kernel_init,
                        name="output")(x)


class CIFAR10MSDNet(nn.Module):
    """CIFAR-10 MSDNet (reference msdnet_cifar10.py:106)."""

    channels: Any = ()
    init_layer_channels: Any = ()
    num_feature_blocks: int = 10
    use_bottleneck: bool = True
    bottleneck_factors: Any = ()
    only_last: bool = True
    in_channels: int = 3
    in_size: Tuple[int, int] = (32, 32)
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = CIFAR10MSDInitLayer(
            out_channels=tuple(self.init_layer_channels),
            name="init_layer")(x, train=train)
        feature_blocks, classifiers = [], []
        in_scales = len(self.init_layer_channels)
        for i in range(self.num_feature_blocks):
            feature_blocks.append(MSDFeatureBlock(
                in_scales=in_scales,
                out_channels=tuple(tuple(c) for c in self.channels[i]),
                use_bottleneck=self.use_bottleneck,
                bottleneck_factors=tuple(
                    tuple(bf) for bf in self.bottleneck_factors[i]),
                name=f"block{i + 1}", parent=None))
            in_scales = len(self.channels[i][-1])
            classifiers.append(CIFAR10MSDClassifier(
                num_classes=self.num_classes, name=f"classifier{i + 1}",
                parent=None))
        fb_seq = IndexedSeq(layers=tuple(feature_blocks),
                            name="feature_blocks")
        cl_seq = IndexedSeq(layers=tuple(classifiers), name="classifiers")
        outs = []
        for i in range(self.num_feature_blocks):
            x = fb_seq(x, i, train=train)
            outs.append(cl_seq(x[-1], i, train=train))
        if self.only_last:
            return outs[-1]
        return outs


def get_msdnet_cifar10(blocks: int, **kwargs) -> CIFAR10MSDNet:
    """Config expander (reference msdnet_cifar10.py:197)."""
    assert blocks == 22
    init_layer_channels, channels, bottleneck_factors = msdnet_channels(
        num_scales=3, init_channels=16)
    return CIFAR10MSDNet(channels=channels,
                         init_layer_channels=init_layer_channels,
                         num_feature_blocks=10, use_bottleneck=True,
                         bottleneck_factors=bottleneck_factors, **kwargs)


@register_model("msdnet22_cifar10")
def msdnet22_cifar10(**kwargs):
    return get_msdnet_cifar10(blocks=22, **kwargs)
