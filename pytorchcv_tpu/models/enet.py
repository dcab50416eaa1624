"""ENet, TPU-native. Behavioral reference: pytorchcv ``models/enet.py``
(ENetMaxDownBlock:16, ENetUpBlock:56, ENetUnit:86, ENetStage:253,
ENetMixDownBlock:320, ENet:385, get_enet:502).

The encoder's max-pool indices drive the decoder's unpooling; on TPU these
are torch-compatible flat positions produced/consumed by the branch-free
``max_pool2d_with_indices`` / ``max_unpool2d`` primitives (nn/ops.py)."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (AsymConvBlock, ConvBlock, DeconvBlock, NormActivation,
                  conv1x1_block, conv3x3, max_pool2d, max_pool2d_with_indices,
                  max_unpool2d)
from ..nn.activ import lambda_prelu, lambda_relu
from ..nn.base import Composed
from ..nn.norm import lambda_batchnorm2d
from .registry import register_model

__all__ = ["ENet", "get_enet", "ENetMixDownBlock"]


class ENetUpBlock(nn.Module):
    """1x1 conv + max-unpool identity branch (reference enet.py:56)."""

    out_channels: int = 0
    bias: bool = False

    @nn.compact
    def __call__(self, x, max_indices, train: bool = False):
        x = conv1x1_block(out_channels=self.out_channels, bias=self.bias,
                          activation=None, name="conv")(x, train=train)
        return max_unpool2d(x, max_indices, 2)


class ENetUnit(nn.Module):
    """ENet bottleneck unit (reference enet.py:86)."""

    out_channels: int = 0
    kernel_size: int = 3
    padding: int = 1
    dilation: int = 1
    use_asym_conv: bool = False
    dropout_rate: float = 0.0
    bias: bool = False
    activation: Any = None
    down: bool = False
    bottleneck_factor: int = 4

    @nn.compact
    def __call__(self, x, max_indices=None, train: bool = False):
        in_channels = x.shape[-1]
        resize_identity = (in_channels != self.out_channels)
        mid_channels = in_channels // self.bottleneck_factor
        act = self.activation
        out_indices = None
        if not resize_identity:
            identity = x
            y = conv1x1_block(out_channels=mid_channels, bias=self.bias,
                              activation=act, name="conv1")(x, train=train)
            if self.use_asym_conv:
                y = AsymConvBlock(channels=mid_channels,
                                  kernel_size=self.kernel_size,
                                  padding=self.padding,
                                  dilation=self.dilation, bias=self.bias,
                                  lw_activation=act, rw_activation=act,
                                  name="conv2")(y, train=train)
            else:
                y = ConvBlock(out_channels=mid_channels,
                              kernel_size=self.kernel_size,
                              padding=self.padding, dilation=self.dilation,
                              bias=self.bias, activation=act,
                              name="conv2")(y, train=train)
        elif self.down:
            # identity: max-pool with indices + zero-pad channels
            # (reference enet.py:16-54)
            pooled, out_indices = max_pool2d_with_indices(
                self.kernel_size, 2, self.padding)(x)
            pad_c = self.out_channels - in_channels
            identity = jnp.pad(pooled, ((0, 0), (0, 0), (0, 0), (0, pad_c)))
            y = ConvBlock(out_channels=mid_channels, kernel_size=2, stride=2,
                          padding=0, bias=self.bias, activation=act,
                          name="conv1")(x, train=train)
            y = ConvBlock(out_channels=mid_channels,
                          kernel_size=self.kernel_size, padding=self.padding,
                          dilation=self.dilation, bias=self.bias,
                          activation=act, name="conv2")(y, train=train)
        else:
            # identity: 1x1 conv + unpool (reference enet.py:56-84)
            identity = ENetUpBlock(
                out_channels=self.out_channels, bias=self.bias,
                name="identity_block")(x, max_indices, train=train)
            y = conv1x1_block(out_channels=mid_channels, bias=self.bias,
                              activation=act, name="conv1")(x, train=train)
            y = DeconvBlock(out_channels=mid_channels,
                            kernel_size=self.kernel_size, stride=2,
                            padding=self.padding, out_padding=1,
                            dilation=self.dilation, bias=self.bias,
                            activation=act, name="conv2")(y, train=train)
        y = conv1x1_block(out_channels=self.out_channels, bias=self.bias,
                          activation=act, name="conv3")(y, train=train)
        if train and self.dropout_rate > 0:
            y = nn.Dropout(rate=self.dropout_rate, deterministic=False,
                           broadcast_dims=(1, 2))(y)
        y = y + identity
        from ..nn.activ import create_activation_layer
        y = create_activation_layer(self.activation, name="activ")(y)
        if resize_identity and self.down:
            return y, out_indices
        return y


class ENetStage(nn.Module):
    """ENet stage: scale unit + plain units (reference enet.py:253)."""

    out_channels: int = 0
    kernel_sizes: Tuple = ()
    paddings: Tuple = ()
    dilations: Tuple = ()
    use_asym_convs: Tuple = ()
    dropout_rate: float = 0.0
    bias: bool = False
    down: bool = False

    @nn.compact
    def __call__(self, x, max_indices=None, train: bool = False):
        from ..nn import Sequential
        activation = lambda_prelu(num_parameters=1) if self.down \
            else lambda_relu()
        out_indices = max_indices

        def make_unit(i, parent):
            return ENetUnit(
                out_channels=self.out_channels,
                kernel_size=self.kernel_sizes[i],
                padding=self.paddings[i], dilation=self.dilations[i],
                use_asym_conv=(self.use_asym_convs[i] == 1),
                dropout_rate=self.dropout_rate, bias=self.bias,
                activation=activation, down=self.down,
                name=("scale_unit" if i == 0 else f"unit{i + 1}"),
                parent=parent)

        scale_unit = make_unit(0, parent=self)
        if self.down:
            x, out_indices = scale_unit(x, train=train)
        else:
            x = scale_unit(x, max_indices, train=train)
        rest = tuple(make_unit(i, parent=None)
                     for i in range(1, len(self.kernel_sizes)))
        if rest:
            x = Sequential(layers=rest, name="units")(x, train=train)
        if self.down:
            return x, out_indices
        return x


class ENetMixDownBlock(nn.Module):
    """Parallel pool + strided conv stem (reference enet.py:320).
    ``activation=None`` means the reference's default ReLU."""

    out_channels: int = 0
    bias: bool = False
    bn_eps: float = 1e-5
    activation: Any = None
    correct_size_mismatch: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        y1 = max_pool2d(2, 2)(x)
        y2 = conv3x3(out_channels=self.out_channels - in_channels, stride=2,
                     bias=self.bias, name="conv")(x)
        if self.correct_size_mismatch:
            diff_h = y2.shape[1] - y1.shape[1]
            diff_w = y2.shape[2] - y1.shape[2]
            y1 = jnp.pad(y1, ((0, 0),
                              (diff_h // 2, diff_h - diff_h // 2),
                              (diff_w // 2, diff_w - diff_w // 2), (0, 0)))
        x = jnp.concatenate([y2, y1], axis=-1)
        activation = self.activation if self.activation is not None \
            else lambda_relu()
        return NormActivation(
            normalization=lambda_batchnorm2d(eps=self.bn_eps),
            activation=activation,
            name="norm_activ")(x, train=train)


class ENet(Composed):
    """ENet segmentation net (reference enet.py:385)."""

    channels: Any = None
    init_block_channels: int = 16
    kernel_sizes: Any = None
    paddings: Any = None
    dilations: Any = None
    use_asym_convs: Any = None
    dropout_rates: Any = None
    downs: Any = None
    correct_size_mismatch: bool = False
    bn_eps: float = 1e-5
    aux: bool = False
    fixed_size: bool = False
    in_size: Tuple[int, int] = (1024, 2048)
    in_channels: int = 3
    num_classes: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..nn.conv import ConvTranspose2d
        x = ENetMixDownBlock(
            out_channels=self.init_block_channels, bias=False,
            bn_eps=self.bn_eps,
            activation=lambda_prelu(num_parameters=1),
            correct_size_mismatch=self.correct_size_mismatch,
            name="stem")(x, train=train)
        stages = []
        for i, channels_per_stage in enumerate(self.channels):
            stages.append(ENetStage(
                out_channels=channels_per_stage,
                kernel_sizes=tuple(self.kernel_sizes[i]),
                paddings=tuple(self.paddings[i]),
                dilations=tuple(self.dilations[i]),
                use_asym_convs=tuple(self.use_asym_convs[i]),
                dropout_rate=self.dropout_rates[i], bias=False,
                down=(self.downs[i] == 1), name=f"stage{i + 1}"))
        x, max_indices1 = stages[0](x, train=train)
        x, max_indices2 = stages[1](x, train=train)
        x = stages[2](x, max_indices2, train=train)
        x = stages[3](x, max_indices1, train=train)
        x = ConvTranspose2d(out_channels=self.num_classes, kernel_size=3,
                            stride=2, padding=1, out_padding=1, bias=False,
                            name="head")(x)
        return x


def get_enet(**kwargs):
    """Config expander (reference enet.py:502)."""
    channels = [64, 128, 64, 16]
    kernel_sizes = [[3, 3, 3, 3, 3],
                    [3, 3, 3, 5, 3, 3, 3, 5, 3, 3, 3, 5, 3, 3, 3, 5, 3],
                    [3, 3, 3], [3, 3]]
    paddings = [[1, 1, 1, 1, 1],
                [1, 1, 2, 2, 4, 1, 8, 2, 16, 1, 2, 2, 4, 1, 8, 2, 16],
                [1, 1, 1], [1, 1]]
    dilations = [[1, 1, 1, 1, 1],
                 [1, 1, 2, 1, 4, 1, 8, 1, 16, 1, 2, 1, 4, 1, 8, 1, 16],
                 [1, 1, 1], [1, 1]]
    use_asym_convs = [[0, 0, 0, 0, 0],
                      [0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1, 0],
                      [0, 0, 0], [0, 0]]
    dropout_rates = [0.01, 0.1, 0.1, 0.1]
    downs = [1, 1, 0, 0]
    return ENet(channels=channels, init_block_channels=16,
                kernel_sizes=kernel_sizes, paddings=paddings,
                dilations=dilations, use_asym_convs=use_asym_convs,
                dropout_rates=dropout_rates, downs=downs, **kwargs)


@register_model("enet_cityscapes")
def enet_cityscapes(num_classes: int = 19, **kwargs):
    return get_enet(num_classes=num_classes, **kwargs)
