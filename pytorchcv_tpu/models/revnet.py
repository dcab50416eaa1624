"""RevNet for ImageNet-1K, TPU-native (JAX/flax, NHWC).

Behavioral reference: pytorchcv ``models/revnet.py``
(ReversibleBlockFunction:27, ReversibleBlock:106, RevResBlock:153,
RevResBottleneck:201, RevUnit:261, RevPostActivation:316, RevNet:343,
get_revnet:442) from 'The Reversible Residual Network' —
https://arxiv.org/abs/1707.04585.

Memory-saving note: the reference implements a custom autograd Function
that reconstructs inputs from outputs in backward. The JAX equivalent of
that FLOPs-for-memory trade is ``jax.checkpoint`` (rematerialization) —
each reversible block is wrapped in ``nn.remat`` when
``remat=True`` so no intermediate activations are stored under ``grad``;
XLA re-runs the cheap couple of convs in the backward pass. The additive
coupling (y1 = x1 + f(x2); y2 = x2 + g(y1)) itself is identical."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (BatchNorm, Sequential, avg_pool2d, conv1x1, conv1x1_block,
                  conv3x3, conv3x3_block, pre_conv1x1_block,
                  pre_conv3x3_block)
from ..nn.base import IntPair, dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["RevNet", "get_revnet"]


class RevResBlock(nn.Module):
    """Simple residual body (reference revnet.py:153)."""

    out_channels: int = 0
    stride: IntPair = 1
    preactivate: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.preactivate:
            x = pre_conv3x3_block(out_channels=self.out_channels,
                                  stride=self.stride, name="conv1")(
                                      x, train=train)
        else:
            x = conv3x3(out_channels=self.out_channels, stride=self.stride,
                        name="conv1")(x)
        return pre_conv3x3_block(out_channels=self.out_channels,
                                 name="conv2")(x, train=train)


class RevResBottleneck(nn.Module):
    """Bottleneck body (reference revnet.py:201)."""

    out_channels: int = 0
    stride: IntPair = 1
    preactivate: bool = True
    bottleneck_factor: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = self.out_channels // self.bottleneck_factor
        if self.preactivate:
            x = pre_conv1x1_block(out_channels=mid_channels, name="conv1")(
                x, train=train)
        else:
            x = conv1x1(out_channels=mid_channels, name="conv1")(x)
        x = pre_conv3x3_block(out_channels=mid_channels, stride=self.stride,
                              name="conv2")(x, train=train)
        return pre_conv1x1_block(out_channels=self.out_channels,
                                 name="conv3")(x, train=train)


class ReversibleBlock(nn.Module):
    """Additive coupling block (reference revnet.py:106): split channels,
    y1 = x1 + fm(x2), y2 = x2 + gm(y1). ``fm``/``gm`` scope names mirror
    the reference's (swapped-argument) attribute assignment."""

    out_channels2: int = 0
    bottleneck: bool = True
    preactivate: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        body = RevResBottleneck if self.bottleneck else RevResBlock
        fm = body(out_channels=self.out_channels2,
                  preactivate=self.preactivate, name="fm")
        gm = body(out_channels=self.out_channels2,
                  preactivate=self.preactivate, name="gm")
        x1, x2 = jnp.split(x, 2, axis=-1)
        y1 = x1 + fm(x2, train=train)
        y2 = x2 + gm(y1, train=train)
        return jnp.concatenate([y1, y2], axis=-1)


def reversible_block_inverse(block: "ReversibleBlock", variables, y,
                             train: bool = False):
    """x from y (reference ReversibleBlock.inverse:131). Functional —
    reapplies the block's fm/gm on their variable subtrees."""
    body = RevResBottleneck if block.bottleneck else RevResBlock

    def sub(name):
        v = {"params": variables["params"][name]}
        if "batch_stats" in variables:
            v["batch_stats"] = variables["batch_stats"][name]
        return v

    fm = body(out_channels=block.out_channels2,
              preactivate=block.preactivate)
    gm = body(out_channels=block.out_channels2,
              preactivate=block.preactivate)
    y1, y2 = jnp.split(y, 2, axis=-1)
    x2 = y2 - gm.apply(sub("gm"), y1, train=train)
    x1 = y1 - fm.apply(sub("fm"), x2, train=train)
    return jnp.concatenate([x1, x2], axis=-1)


class RevUnit(nn.Module):
    """RevNet unit (reference revnet.py:261): reversible coupling when the
    shape is preserved, plain residual otherwise."""

    out_channels: int = 0
    stride: IntPair = 1
    bottleneck: bool = True
    preactivate: bool = True
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        resize_identity = (x.shape[-1] != self.out_channels) or \
            (self.stride != 1)
        body_class = RevResBottleneck if self.bottleneck else RevResBlock
        if not resize_identity and self.stride == 1:
            block = ReversibleBlock
            if self.remat:
                block = nn.remat(ReversibleBlock, static_argnums=(2,))
            return block(out_channels2=self.out_channels // 2,
                         bottleneck=self.bottleneck,
                         preactivate=self.preactivate, name="body")(
                             x, train)
        identity = conv1x1_block(out_channels=self.out_channels,
                                 stride=self.stride, activation=None,
                                 name="identity_conv")(x, train=train)
        x = body_class(out_channels=self.out_channels, stride=self.stride,
                       preactivate=self.preactivate, name="body")(
                           x, train=train)
        return x + identity


class RevPostActivation(nn.Module):
    """Final BN+ReLU (reference revnet.py:316)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.relu(BatchNorm(name="bn")(x, train=train))


def RevNet(channels, init_block_channels: int, bottleneck: bool,
           remat: bool = False, in_channels: int = 3,
           in_size: Tuple[int, int] = (224, 224),
           num_classes: int = 1000) -> ImageClassifier:
    """RevNet (reference revnet.py:343)."""
    layers = [conv3x3_block(out_channels=init_block_channels,
                            name="init_block", parent=None)]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(RevUnit(
                out_channels=out_channels, stride=stride,
                bottleneck=bottleneck,
                preactivate=(j != 0) or (i != 0), remat=remat,
                name=f"unit{j + 1}", parent=None))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}",
                                 parent=None))
    layers.append(RevPostActivation(name="final_postactiv", parent=None))
    layers.append(avg_pool2d(kernel_size=56, stride=1))
    features = Sequential(layers=tuple(layers), name="features")
    return ImageClassifier(
        features=features,
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_revnet(blocks: int, **kwargs):
    """Config expander (reference revnet.py:442)."""
    if blocks == 38:
        layers, channels_per_layers, bottleneck = [3, 3, 3], [32, 64, 112], \
            False
    elif blocks == 110:
        layers, channels_per_layers, bottleneck = [9, 9, 9], [32, 64, 128], \
            False
    elif blocks == 164:
        layers, channels_per_layers, bottleneck = [9, 9, 9], \
            [128, 256, 512], True
    else:
        raise ValueError(f"Unsupported RevNet with blocks: {blocks}")
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    return RevNet(channels=channels, init_block_channels=32,
                  bottleneck=bottleneck, **kwargs)


@register_model("revnet38")
def revnet38(**kwargs):
    return get_revnet(blocks=38, **kwargs)


@register_model("revnet110")
def revnet110(**kwargs):
    return get_revnet(blocks=110, **kwargs)


@register_model("revnet164")
def revnet164(**kwargs):
    return get_revnet(blocks=164, **kwargs)
