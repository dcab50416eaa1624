"""Lightweight OpenPose 2D/3D for CMU Panoptic, TPU-native. Behavioral
reference: pytorchcv ``models/lwopenpose_cmupan.py`` (LwopResBottleneck:15,
LwopResUnit:77, LwopEncoderFinalBlock:139, LwopRefinementBlock:181,
LwopDecoderBend:219, LwopDecoderInitBlock:256, LwopDecoderUnit:306,
LwopDecoderFeaturesBend:355, LwopDecoderFinalBlock:392, LwOpenPose:448,
get_lwopenpose:569)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import (DwsConvBlock, Sequential, conv1x1, conv1x1_block,
                  conv3x3_block, dwsconv3x3_block)
from ..nn.base import Composed
from .registry import register_model

__all__ = ["LwOpenPose", "get_lwopenpose", "LwopDecoderFinalBlock"]

_elu = jax.nn.elu


class LwopResBottleneck(nn.Module):
    """Biased bottleneck (reference lwopenpose_cmupan.py:15)."""

    out_channels: int = 0
    stride: int = 1
    bias: bool = True
    bottleneck_factor: int = 2
    squeeze_out: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        mid_channels = self.out_channels // self.bottleneck_factor \
            if self.squeeze_out else in_channels // self.bottleneck_factor
        x = conv1x1_block(out_channels=mid_channels, bias=self.bias,
                          name="conv1")(x, train=train)
        x = conv3x3_block(out_channels=mid_channels, stride=self.stride,
                          bias=self.bias, name="conv2")(x, train=train)
        return conv1x1_block(out_channels=self.out_channels, bias=self.bias,
                             activation=None, name="conv3")(x, train=train)


class LwopResUnit(nn.Module):
    """Residual unit (reference lwopenpose_cmupan.py:77)."""

    out_channels: int = 0
    stride: int = 1
    bias: bool = True
    bottleneck_factor: int = 2
    squeeze_out: bool = False
    activate: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        resize_identity = (in_channels != self.out_channels) or \
            (self.stride != 1)
        if resize_identity:
            identity = conv1x1_block(
                out_channels=self.out_channels, stride=self.stride,
                bias=self.bias, activation=None,
                name="identity_conv")(x, train=train)
        else:
            identity = x
        x = LwopResBottleneck(out_channels=self.out_channels,
                              stride=self.stride, bias=self.bias,
                              bottleneck_factor=self.bottleneck_factor,
                              squeeze_out=self.squeeze_out,
                              name="body")(x, train=train)
        x = x + identity
        if self.activate:
            x = nn.relu(x)
        return x


class LwopEncoderFinalBlock(nn.Module):
    """Encoder final block (reference lwopenpose_cmupan.py:139)."""

    out_channels: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv1x1_block(out_channels=self.out_channels, bias=True,
                          normalization=None,
                          name="pre_conv")(x, train=train)
        body = tuple(DwsConvBlock(
            out_channels=self.out_channels, dw_use_bn=False, pw_use_bn=False,
            dw_activation=_elu, pw_activation=_elu,
            name=f"block{i + 1}", parent=None) for i in range(3))
        y = Sequential(layers=body, name="body")(x, train=train)
        x = x + y
        return conv3x3_block(out_channels=self.out_channels, bias=True,
                             normalization=None,
                             name="post_conv")(x, train=train)


class LwopRefinementBlock(nn.Module):
    """Refinement block (reference lwopenpose_cmupan.py:181)."""

    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv1x1_block(out_channels=self.out_channels, bias=True,
                          normalization=None,
                          name="pre_conv")(x, train=train)
        y = Sequential(layers=(
            conv3x3_block(out_channels=self.out_channels, bias=True,
                          name="block1", parent=None),
            conv3x3_block(out_channels=self.out_channels, padding=2,
                          dilation=2, bias=True, name="block2", parent=None),
        ), name="body")(x, train=train)
        return x + y


class LwopDecoderBend(nn.Module):
    """Two-conv bend (reference lwopenpose_cmupan.py:219)."""

    mid_channels: int = 0
    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv1x1_block(out_channels=self.mid_channels, bias=True,
                          normalization=None, name="conv1")(x, train=train)
        return conv1x1(out_channels=self.out_channels, bias=True,
                       name="conv2")(x)


class LwopDecoderInitBlock(nn.Module):
    """Decoder init (reference lwopenpose_cmupan.py:256)."""

    keypoints: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        body = tuple(conv3x3_block(out_channels=in_channels, bias=True,
                                   normalization=None, name=f"block{i + 1}",
                                   parent=None) for i in range(3))
        y = Sequential(layers=body, name="body")(x, train=train)
        heatmap = LwopDecoderBend(mid_channels=512,
                                  out_channels=self.keypoints,
                                  name="heatmap_bend")(y, train=train)
        paf = LwopDecoderBend(mid_channels=512,
                              out_channels=2 * self.keypoints,
                              name="paf_bend")(y, train=train)
        return jnp.concatenate([x, heatmap, paf], axis=-1)


class LwopDecoderUnit(nn.Module):
    """Decoder refinement unit (reference lwopenpose_cmupan.py:306)."""

    keypoints: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        num_heatmap = self.keypoints
        num_paf = 2 * self.keypoints
        features_channels = in_channels - num_heatmap - num_paf
        features = x[..., :features_channels]
        body = tuple(LwopRefinementBlock(out_channels=features_channels,
                                         name=f"block{i + 1}", parent=None)
                     for i in range(5))
        y = Sequential(layers=body, name="body")(x, train=train)
        heatmap = LwopDecoderBend(mid_channels=features_channels,
                                  out_channels=num_heatmap,
                                  name="heatmap_bend")(y, train=train)
        paf = LwopDecoderBend(mid_channels=features_channels,
                              out_channels=num_paf,
                              name="paf_bend")(y, train=train)
        return jnp.concatenate([features, heatmap, paf], axis=-1)


class LwopDecoderFeaturesBend(nn.Module):
    """3D features bend (reference lwopenpose_cmupan.py:355)."""

    mid_channels: int = 0
    out_channels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        body = tuple(LwopRefinementBlock(out_channels=self.mid_channels,
                                         name=f"block{i + 1}", parent=None)
                     for i in range(2))
        x = Sequential(layers=body, name="body")(x, train=train)
        return LwopDecoderBend(mid_channels=self.mid_channels,
                               out_channels=self.out_channels,
                               name="features_bend")(x, train=train)


class LwopDecoderFinalBlock(nn.Module):
    """Final 2D/3D block (reference lwopenpose_cmupan.py:392)."""

    keypoints: int = 19
    bottleneck_factor: int = 2
    calc_3d_features: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        num_heatmap_paf = 3 * self.keypoints
        heatmap_paf_2d = x[..., -num_heatmap_paf:]
        if not self.calc_3d_features:
            return heatmap_paf_2d
        features_in_channels = x.shape[-1] - num_heatmap_paf
        body = tuple(LwopResUnit(
            out_channels=features_in_channels,
            bottleneck_factor=self.bottleneck_factor,
            name=f"block{i + 1}", parent=None) for i in range(5))
        x = Sequential(layers=body, name="body")(x, train=train)
        x = LwopDecoderFeaturesBend(
            mid_channels=features_in_channels,
            out_channels=num_heatmap_paf,
            name="features_bend")(x, train=train)
        return jnp.concatenate([heatmap_paf_2d, x], axis=-1)


class LwOpenPose(Composed):
    """Lightweight OpenPose (reference lwopenpose_cmupan.py:448)."""

    encoder_channels: object = None
    encoder_paddings: object = None
    encoder_init_block_channels: int = 32
    encoder_final_block_channels: int = 128
    refinement_units: int = 1
    calc_3d_features: bool = False
    return_heatmap: bool = True
    in_size: Tuple[int, int] = (368, 368)
    in_channels: int = 3
    keypoints: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        backbone = [conv3x3_block(
            out_channels=self.encoder_init_block_channels, stride=2,
            name="init_block", parent=None)]
        for i, channels_per_stage in enumerate(self.encoder_channels):
            units = []
            for j, out_channels in enumerate(channels_per_stage):
                stride = 2 if (j == 0) and (i != 0) else 1
                padding = self.encoder_paddings[i][j]
                units.append(dwsconv3x3_block(
                    out_channels=out_channels, stride=stride,
                    padding=padding, dilation=padding,
                    name=f"unit{j + 1}", parent=None))
            backbone.append(Sequential(layers=tuple(units),
                                       name=f"stage{i + 1}", parent=None))
        encoder = Sequential(layers=(
            Sequential(layers=tuple(backbone), name="backbone", parent=None),
            LwopEncoderFinalBlock(
                out_channels=self.encoder_final_block_channels,
                name="final_block", parent=None),
        ), name="encoder")
        x = encoder(x, train=train)
        decoder = [LwopDecoderInitBlock(keypoints=self.keypoints,
                                        name="init_block", parent=None)]
        for i in range(self.refinement_units):
            decoder.append(LwopDecoderUnit(keypoints=self.keypoints,
                                           name=f"unit{i + 1}", parent=None))
        decoder.append(LwopDecoderFinalBlock(
            keypoints=self.keypoints, bottleneck_factor=2,
            calc_3d_features=self.calc_3d_features, name="final_block",
            parent=None))
        return Sequential(layers=tuple(decoder),
                          name="decoder")(x, train=train)


def get_lwopenpose(calc_3d_features: bool, keypoints: int, **kwargs):
    """Config expander (reference lwopenpose_cmupan.py:569)."""
    encoder_channels = [[64], [128, 128],
                        [256, 256, 512, 512, 512, 512, 512, 512]]
    encoder_paddings = [[1], [1, 1], [1, 1, 1, 2, 1, 1, 1, 1]]
    return LwOpenPose(encoder_channels=encoder_channels,
                      encoder_paddings=encoder_paddings,
                      encoder_init_block_channels=32,
                      encoder_final_block_channels=128,
                      refinement_units=1,
                      calc_3d_features=calc_3d_features,
                      keypoints=keypoints, **kwargs)


@register_model("lwopenpose2d_mobilenet_cmupan_coco")
def lwopenpose2d_mobilenet_cmupan_coco(keypoints: int = 19, **kwargs):
    return get_lwopenpose(calc_3d_features=False, keypoints=keypoints,
                          **kwargs)


@register_model("lwopenpose3d_mobilenet_cmupan_coco")
def lwopenpose3d_mobilenet_cmupan_coco(keypoints: int = 19, **kwargs):
    return get_lwopenpose(calc_3d_features=True, keypoints=keypoints,
                          **kwargs)
