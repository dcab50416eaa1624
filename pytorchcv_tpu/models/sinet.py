"""SINet for image segmentation, TPU-native (JAX/flax, NHWC).

Behavioral reference: pytorchcv ``models/sinet.py`` (SEBlock:21,
DwsConvBlock:91, FDWConvBlock:189, SBBlock:278, PreActivation:350,
ESPBlock:380, SBStage:447, SBEncoderInitBlock:512, SBEncoder:556,
SBDecodeBlock:637, SBDecoder:673, SINet:725, get_sinet:817) from 'SINet:
Extreme Lightweight Portrait Segmentation Networks with Spatial Squeeze
Modules and Information Blocking Decoder' https://arxiv.org/abs/1911.09099.

The information-blocking decoder's confidence gate (softmax-max over
classes) is a cheap VPU reduction fused into the upsample path."""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import (ChannelShuffle, Concurrent, ConvTranspose2d,
                  InterpolationBlock, PReLU, Sequential, avg_pool2d,
                  channel_shuffle, conv1x1, conv1x1_block, conv3x3_block,
                  dwconv_block, lambda_batchnorm2d, lambda_prelu,
                  lambda_relu)
from ..nn.activ import create_activation_layer
from ..nn.base import IntPair, dense_kernel_init
from ..nn.norm import create_normalization_layer
from .registry import register_model

__all__ = ["SINet", "get_sinet"]


class SESINetBlock(nn.Module):
    """SINet's SE variant: dense fc1 (+optional act+fc2) gate (reference
    sinet.py:21). ``reduction=1`` degenerates to fc1+sigmoid only."""

    reduction: int = 16
    mid_activation: Any = lambda_relu()
    out_activation: Any = None  # reference passes PReLU named "sigmoid"

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        channels = x.shape[-1]
        use_fc2 = self.reduction > 1
        mid_channels = channels // self.reduction
        w = jnp.mean(x, axis=(1, 2))
        w = nn.Dense(mid_channels, kernel_init=dense_kernel_init,
                     name="fc1")(w)
        if use_fc2:
            w = create_activation_layer(self.mid_activation, name="activ")(w)
            w = nn.Dense(channels, kernel_init=dense_kernel_init,
                         name="fc2")(w)
        if self.out_activation is None:
            w = nn.sigmoid(w)
        else:
            w = create_activation_layer(self.out_activation,
                                        name="sigmoid")(w)
        return x * w[:, None, None, :]


class SIDwsConvBlock(nn.Module):
    """SINet depthwise-separable block with optional SE between dw and pw
    (reference sinet.py:91)."""

    out_channels: int = 0
    kernel_size: IntPair = 3
    stride: IntPair = 1
    padding: IntPair = 1
    dw_normalization: Any = lambda_batchnorm2d()
    pw_normalization: Any = lambda_batchnorm2d()
    dw_activation: Any = lambda_relu()
    pw_activation: Any = lambda_relu()
    se_reduction: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        x = dwconv_block(out_channels=in_channels,
                         kernel_size=self.kernel_size, stride=self.stride,
                         padding=self.padding,
                         normalization=self.dw_normalization,
                         activation=self.dw_activation, name="dw_conv")(
                             x, train=train)
        if self.se_reduction > 0:
            x = SESINetBlock(
                reduction=self.se_reduction,
                mid_activation=lambda_prelu(
                    in_channels // self.se_reduction),
                out_activation=lambda_prelu(in_channels),
                name="se")(x, train=train)
        return conv1x1_block(out_channels=self.out_channels,
                             normalization=self.pw_normalization,
                             activation=self.pw_activation, name="pw_conv")(
                                 x, train=train)


class FDWConvBlock(nn.Module):
    """Factorized depthwise: (k,1) + (1,k) summed, then activation
    (reference sinet.py:189)."""

    kernel_size: int = 3
    padding: int = 1
    normalization: Any = lambda_batchnorm2d()
    activation: Any = lambda_relu()

    @nn.compact
    def __call__(self, x, train: bool = False):
        channels = x.shape[-1]
        v = dwconv_block(out_channels=channels,
                         kernel_size=(self.kernel_size, 1),
                         padding=(self.padding, 0),
                         normalization=self.normalization,
                         activation=None, name="v_conv")(x, train=train)
        h = dwconv_block(out_channels=channels,
                         kernel_size=(1, self.kernel_size),
                         padding=(0, self.padding),
                         normalization=self.normalization,
                         activation=None, name="h_conv")(x, train=train)
        x = v + h
        act = create_activation_layer(self.activation, name="act")
        return act(x) if act is not None else x


class SBBlock(nn.Module):
    """Spatial-squeeze block (reference sinet.py:278)."""

    out_channels: int = 0
    kernel_size: int = 3
    scale_factor: int = 1
    normalization: Any = lambda_batchnorm2d()

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        use_scale = self.scale_factor > 1
        if use_scale:
            x = avg_pool2d(kernel_size=self.scale_factor,
                           stride=self.scale_factor)(x)
        if self.scale_factor > 0:
            x = FDWConvBlock(kernel_size=self.kernel_size,
                             padding=self.kernel_size // 2,
                             normalization=self.normalization,
                             activation=lambda_prelu(in_channels),
                             name="conv1")(x, train=train)
        else:
            x = dwconv_block(out_channels=in_channels, kernel_size=3,
                             padding=1, normalization=self.normalization,
                             activation=lambda_prelu(in_channels),
                             name="conv1")(x, train=train)
        x = conv1x1(out_channels=self.out_channels, name="conv2")(x)
        if use_scale:
            x = InterpolationBlock(scale_factor=self.scale_factor)(x)
        return create_normalization_layer(self.normalization, name="bn")(
            x, train=train)


class SIPreActivation(nn.Module):
    """BN + PReLU (reference sinet.py:350)."""

    normalization: Any = lambda_batchnorm2d()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = create_normalization_layer(self.normalization, name="bn")(
            x, train=train)
        return PReLU(num_parameters=x.shape[-1], name="activ")(x)


class SIESPBlock(nn.Module):
    """Reduce -> split -> transform -> merge ESP block (reference
    sinet.py:380)."""

    out_channels: int = 0
    kernel_sizes: Any = ()
    scale_factors: Any = ()
    use_residual: bool = True
    normalization: Any = lambda_batchnorm2d()

    @nn.compact
    def __call__(self, x, train: bool = False):
        groups = len(self.kernel_sizes)
        mid_channels = int(self.out_channels / groups)
        res_channels = self.out_channels - groups * mid_channels
        identity = x
        x = conv1x1(out_channels=mid_channels, groups=groups,
                    name="conv")(x)
        x = channel_shuffle(x, groups)
        x = Concurrent(layers=tuple(
            SBBlock(out_channels=(mid_channels + res_channels) if i == 0
                    else mid_channels,
                    kernel_size=self.kernel_sizes[i],
                    scale_factor=self.scale_factors[i],
                    normalization=self.normalization,
                    name=f"branch{i + 1}", parent=None)
            for i in range(groups)), name="branches")(x, train=train)
        if self.use_residual:
            x = identity + x
        return SIPreActivation(normalization=self.normalization,
                               name="preactiv")(x, train=train)


class SBStage(nn.Module):
    """Down conv + ESP main branch, concatenated (reference
    sinet.py:447)."""

    down_channels: int = 0
    channels_list: Any = ()
    kernel_sizes_list: Any = ()
    scale_factors_list: Any = ()
    use_residual_list: Any = ()
    se_reduction: int = 1
    normalization: Any = lambda_batchnorm2d()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SIDwsConvBlock(
            out_channels=self.down_channels, stride=2,
            dw_normalization=None, pw_normalization=self.normalization,
            dw_activation=None,
            pw_activation=lambda_prelu(self.down_channels),
            se_reduction=self.se_reduction, name="down_conv")(
                x, train=train)
        blocks = [SIESPBlock(
            out_channels=out_channels,
            kernel_sizes=tuple(self.kernel_sizes_list[i]),
            scale_factors=tuple(self.scale_factors_list[i]),
            use_residual=(self.use_residual_list[i] == 1),
            normalization=self.normalization, name=f"block{i + 1}",
            parent=None)
            for i, out_channels in enumerate(self.channels_list)]
        y = Sequential(layers=tuple(blocks), name="main_branch")(
            x, train=train)
        x = jnp.concatenate([x, y], axis=-1)
        x = SIPreActivation(normalization=self.normalization,
                            name="preactiv")(x, train=train)
        return x, y


class SBEncoderInitBlock(nn.Module):
    """conv/2 + dws-conv/2 (reference sinet.py:512)."""

    mid_channels: int = 16
    out_channels: int = 0
    normalization: Any = lambda_batchnorm2d()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.mid_channels, stride=2,
                          normalization=self.normalization,
                          activation=lambda_prelu(self.mid_channels),
                          name="conv1")(x, train=train)
        return SIDwsConvBlock(
            out_channels=self.out_channels, stride=2,
            dw_normalization=None, pw_normalization=self.normalization,
            dw_activation=None,
            pw_activation=lambda_prelu(self.out_channels),
            se_reduction=1, name="conv2")(x, train=train)


class SBEncoder(nn.Module):
    """SINet encoder (reference sinet.py:556)."""

    out_channels: int = 0
    init_block_channels: Any = (16, 21)
    down_channels_list: Any = ()
    channels_list: Any = ()
    kernel_sizes_list: Any = ()
    scale_factors_list: Any = ()
    use_residual_list: Any = ()
    normalization: Any = lambda_batchnorm2d()

    @nn.compact
    def __call__(self, x, train: bool = False):
        y1 = SBEncoderInitBlock(
            mid_channels=self.init_block_channels[0],
            out_channels=self.init_block_channels[1],
            normalization=self.normalization, name="init_block")(
                x, train=train)
        x, y2 = SBStage(
            down_channels=self.down_channels_list[0],
            channels_list=tuple(self.channels_list[0]),
            kernel_sizes_list=tuple(self.kernel_sizes_list[0]),
            scale_factors_list=tuple(self.scale_factors_list[0]),
            use_residual_list=tuple(self.use_residual_list[0]),
            se_reduction=1, normalization=self.normalization,
            name="stage1")(y1, train=train)
        x, _ = SBStage(
            down_channels=self.down_channels_list[1],
            channels_list=tuple(self.channels_list[1]),
            kernel_sizes_list=tuple(self.kernel_sizes_list[1]),
            scale_factors_list=tuple(self.scale_factors_list[1]),
            use_residual_list=tuple(self.use_residual_list[1]),
            se_reduction=2, normalization=self.normalization,
            name="stage2")(x, train=train)
        x = conv1x1(out_channels=self.out_channels, name="output")(x)
        return x, y2, y1


class SBDecodeBlock(nn.Module):
    """Information-blocking decode: gate the skip by (1 - max class
    confidence) (reference sinet.py:637)."""

    normalization: Any = lambda_batchnorm2d()

    @nn.compact
    def __call__(self, x, y, train: bool = False):
        x = InterpolationBlock(scale_factor=2, align_corners=False)(x)
        x = create_normalization_layer(self.normalization, name="bn")(
            x, train=train)
        w_conf = jax.nn.softmax(x, axis=-1)
        w_max = jnp.max(w_conf, axis=-1, keepdims=True)
        return y * (1.0 - w_max) + x


class SBDecoder(nn.Module):
    """SINet decoder (reference sinet.py:673)."""

    dim2: int = 48
    num_classes: int = 19
    normalization: Any = lambda_batchnorm2d()

    @nn.compact
    def __call__(self, y3, y2, y1, train: bool = False):
        y2 = conv1x1_block(out_channels=self.num_classes,
                           normalization=self.normalization,
                           activation=lambda_prelu(self.num_classes),
                           name="conv3c")(y2, train=train)
        x = SBDecodeBlock(normalization=self.normalization,
                          name="decode1")(y3, y2, train=train)
        x = SBDecodeBlock(normalization=self.normalization,
                          name="decode2")(x, y1, train=train)
        x = ConvTranspose2d(out_channels=self.num_classes, kernel_size=2,
                            stride=2, padding=0, bias=False,
                            name="output")(x)
        return InterpolationBlock(scale_factor=2)(x)


class SINet(nn.Module):
    """SINet (reference sinet.py:725)."""

    down_channels_list: Any = ()
    channels_list: Any = ()
    kernel_sizes_list: Any = ()
    scale_factors_list: Any = ()
    use_residual_list: Any = ()
    dim2: int = 48
    bn_eps: float = 1e-3
    aux: bool = False
    fixed_size: bool = False
    in_channels: int = 3
    in_size: Tuple[int, int] = (1024, 2048)
    num_classes: int = 21

    @nn.compact
    def __call__(self, x, train: bool = False):
        normalization = lambda_batchnorm2d(eps=self.bn_eps)
        y3, y2, y1 = SBEncoder(
            out_channels=self.num_classes,
            init_block_channels=(16, self.num_classes),
            down_channels_list=tuple(self.down_channels_list),
            channels_list=tuple(self.channels_list),
            kernel_sizes_list=tuple(self.kernel_sizes_list),
            scale_factors_list=tuple(self.scale_factors_list),
            use_residual_list=tuple(self.use_residual_list),
            normalization=normalization, name="encoder")(x, train=train)
        out = SBDecoder(dim2=self.dim2, num_classes=self.num_classes,
                        normalization=normalization, name="decoder")(
                            y3, y2, y1, train=train)
        if self.aux:
            return out, y3
        return out



def get_sinet(**kwargs) -> SINet:
    """Config expander (reference sinet.py:817)."""
    kernel_sizes_list = [
        [[3, 5], [3, 3], [3, 3]],
        [[3, 5], [3, 3], [5, 5], [3, 5], [3, 5], [3, 5], [3, 3], [5, 5],
         [3, 5], [3, 5]]]
    scale_factors_list = [
        [[1, 1], [0, 1], [0, 1]],
        [[1, 1], [0, 1], [1, 4], [2, 8], [1, 1], [1, 1], [0, 1], [1, 8],
         [2, 4], [0, 2]]]
    chnn = 4
    dims = [24] + [24 * (i + 2) + 4 * (chnn - 1) for i in range(3)]
    dim1, dim2, dim3, dim4 = dims
    p = len(kernel_sizes_list[0])
    q = len(kernel_sizes_list[1])
    channels_list = [[dim2] * p,
                     ([dim3] * (q // 2)) + ([dim4] * (q - q // 2))]
    use_residual_list = [[0] + ([1] * (p - 1)),
                         [0] + ([1] * (q // 2 - 1)) + [0] +
                         ([1] * (q - q // 2 - 1))]
    down_channels_list = [dim1, dim2]
    return SINet(down_channels_list=down_channels_list,
                 channels_list=channels_list,
                 kernel_sizes_list=kernel_sizes_list,
                 scale_factors_list=scale_factors_list,
                 use_residual_list=use_residual_list, dim2=dims[1],
                 **kwargs)


@register_model("sinet_cityscapes")
def sinet_cityscapes(num_classes: int = 19, **kwargs):
    return get_sinet(num_classes=num_classes, bn_eps=1e-3, **kwargs)
