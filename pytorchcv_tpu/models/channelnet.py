"""ChannelNet for ImageNet-1K, TPU-native (JAX/flax, NHWC).

Behavioral reference: pytorchcv ``models/channelnet.py`` (dwconv3x3:13,
ChannetConv:44, ChannetDwsConvBlock:150, SimpleGroupBlock:189,
ChannelwiseConv2d:224, ConvGroupBlock:264, ChannetUnit:304,
ChannelNet:412, get_channelnet:510) from 'ChannelNets: Compact and
Efficient Convolutional Neural Networks via Channel-Wise Convolutions'
https://arxiv.org/abs/1809.01330.

The channel-wise convolution (reference's Conv3d over the channel axis) is
a 1-D conv along C: positions (B*H*W) batch, channels as the conv axis —
a layout XLA maps to a strided matmul."""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import Sequential, avg_pool2d, conv3x3, lambda_relu6
from ..nn.arch import IndexedSeq
from ..nn.activ import create_activation_layer
from ..nn.base import IntPair, conv_kernel_init, dense_kernel_init
from ..nn.norm import BatchNorm
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["ChannelNet", "get_channelnet"]


class ChannetConv(nn.Module):
    """conv + (dropout) + BN + ReLU6 (reference channelnet.py:44).
    NB: dropout sits BETWEEN conv and BN."""

    out_channels: int = 0
    kernel_size: IntPair = 3
    stride: IntPair = 1
    padding: IntPair = 1
    groups: int = 1
    bias: bool = False
    dropout_rate: float = 0.0
    activate: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..nn.conv import _conv2d
        x = _conv2d(self.out_channels, self.kernel_size, stride=self.stride,
                    padding=self.padding, groups=self.groups,
                    bias=self.bias, name="conv")(x)
        if self.dropout_rate > 0.0:
            x = nn.Dropout(rate=self.dropout_rate,
                           deterministic=not train)(x)
        x = BatchNorm(name="bn")(x, train=train)
        if self.activate:
            x = create_activation_layer(lambda_relu6(), name="activ")(x)
        return x


class ChannetDwsConvBlock(nn.Module):
    """raw depthwise conv + pointwise ChannetConv (reference
    channelnet.py:150)."""

    out_channels: int = 0
    stride: IntPair = 1
    groups: int = 1
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        x = conv3x3(out_channels=in_channels, stride=self.stride,
                    groups=in_channels, name="dw_conv")(x)
        return ChannetConv(out_channels=self.out_channels, kernel_size=1,
                           padding=0, groups=self.groups,
                           dropout_rate=self.dropout_rate,
                           name="pw_conv")(x, train=train)


class SimpleGroupBlock(nn.Module):
    """Stack of grouped dws blocks (reference channelnet.py:189)."""

    multi_blocks: int = 2
    groups: int = 2
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        channels = x.shape[-1]
        return Sequential(layers=tuple(
            ChannetDwsConvBlock(out_channels=channels, stride=1,
                                groups=self.groups,
                                dropout_rate=self.dropout_rate,
                                name=f"block{i + 1}", parent=None)
            for i in range(self.multi_blocks)), name="blocks")(
                x, train=train)


class ChannelwiseConv2d(nn.Module):
    """Channel-axis conv (reference channelnet.py:224: Conv3d with kernel
    (4g,1,1), stride g along C). Output channel order is g-major, matching
    the reference's ``view``."""

    groups: int = 2
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = self.groups
        b, h, w, c = x.shape

        class _ChannelKernel(nn.Module):
            @nn.compact
            def __call__(self):
                return self.param("kernel", conv_kernel_init,
                                  (4 * g, 1, g))

        kernel = _ChannelKernel(name="conv")()
        t = x.reshape(b * h * w, c, 1)
        y = jax.lax.conv_general_dilated(
            t, kernel, window_strides=(g,),
            padding=[(2 * g - 1, 2 * g - 1)],
            dimension_numbers=("NWC", "WIO", "NWC"))
        # (BHW, C/g, g) -> g-major channel order
        y = y.transpose(0, 2, 1).reshape(b, h, w, c)
        if self.dropout_rate > 0.0:
            y = nn.Dropout(rate=self.dropout_rate,
                           deterministic=not train)(y)
        return y


class ConvGroupBlock(nn.Module):
    """Channel-wise conv + grouped dws stack (reference
    channelnet.py:264)."""

    multi_blocks: int = 2
    groups: int = 2
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ChannelwiseConv2d(groups=self.groups,
                              dropout_rate=self.dropout_rate,
                              name="conv")(x, train=train)
        return SimpleGroupBlock(multi_blocks=self.multi_blocks,
                                groups=self.groups,
                                dropout_rate=self.dropout_rate,
                                name="block")(x, train=train)


class ChannetUnit(nn.Module):
    """Two-block unit with seq/add/cat merging (reference
    channelnet.py:304)."""

    out_channels_list: Any = ()
    strides: IntPair = 1
    multi_blocks: int = 2
    groups: int = 2
    dropout_rate: float = 0.0
    block_names: Any = ()
    merge_type: str = "seq"

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert len(self.block_names) == 2
        assert self.merge_type in ("seq", "add", "cat")
        blocks = []
        for i, (out_channels, block_name) in enumerate(
                zip(self.out_channels_list, self.block_names)):
            stride_i = self.strides if i == 0 else 1
            name = f"block{i + 1}"
            if block_name == "channet_conv3x3":
                blocks.append(ChannetConv(
                    out_channels=out_channels, kernel_size=3,
                    stride=stride_i, padding=1,
                    dropout_rate=self.dropout_rate, activate=False,
                    name=name, parent=None))
            elif block_name == "channet_dws_conv_block":
                blocks.append(ChannetDwsConvBlock(
                    out_channels=out_channels, stride=stride_i,
                    dropout_rate=self.dropout_rate, name=name,
                    parent=None))
            elif block_name == "simple_group_block":
                blocks.append(SimpleGroupBlock(
                    multi_blocks=self.multi_blocks, groups=self.groups,
                    dropout_rate=self.dropout_rate, name=name,
                    parent=None))
            elif block_name == "conv_group_block":
                blocks.append(ConvGroupBlock(
                    multi_blocks=self.multi_blocks, groups=self.groups,
                    dropout_rate=self.dropout_rate, name=name,
                    parent=None))
            else:
                raise NotImplementedError()
        holder = IndexedSeq(layers=tuple(blocks), name="blocks")
        x_outs = []
        for i in range(len(blocks)):
            x = holder(x, i, train=train)
            x_outs.append(x)
        if self.merge_type == "add":
            for i in range(len(x_outs) - 1):
                x = x + x_outs[i]
        elif self.merge_type == "cat":
            x = jnp.concatenate(x_outs, axis=-1)
        return x


def ChannelNet(channels, block_names, merge_types,
               dropout_rate: float = 0.0001, multi_blocks: int = 2,
               groups: int = 2, in_channels: int = 3,
               in_size: Tuple[int, int] = (224, 224),
               num_classes: int = 1000) -> ImageClassifier:
    """ChannelNet (reference channelnet.py:412)."""
    stages = []
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            units.append(ChannetUnit(
                out_channels_list=tuple(out_channels),
                strides=(2 if j == 0 else 1), multi_blocks=multi_blocks,
                groups=groups, dropout_rate=dropout_rate,
                block_names=tuple(block_names[i][j]),
                merge_type=merge_types[i][j], name=f"unit{j + 1}",
                parent=None))
        stages.append(Sequential(layers=tuple(units), name=f"stage{i + 1}",
                                 parent=None))
    features = Sequential(layers=(*stages,
                                  avg_pool2d(kernel_size=7, stride=1)),
                          name="features")
    return ImageClassifier(
        features=features,
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_channelnet(**kwargs):
    """Config expander (reference channelnet.py:510)."""
    channels = [[[32, 64]], [[128, 128]], [[256, 256]],
                [[512, 512], [512, 512]], [[1024, 1024]]]
    block_names = [
        [["channet_conv3x3", "channet_dws_conv_block"]],
        [["channet_dws_conv_block", "channet_dws_conv_block"]],
        [["channet_dws_conv_block", "channet_dws_conv_block"]],
        [["channet_dws_conv_block", "simple_group_block"],
         ["conv_group_block", "conv_group_block"]],
        [["channet_dws_conv_block", "channet_dws_conv_block"]]]
    merge_types = [["cat"], ["cat"], ["cat"], ["add", "add"], ["seq"]]
    return ChannelNet(channels=channels, block_names=block_names,
                      merge_types=merge_types, **kwargs)


@register_model("channelnet")
def channelnet(**kwargs):
    return get_channelnet(**kwargs)
