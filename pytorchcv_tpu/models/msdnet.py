"""MSDNet for ImageNet-1K, TPU-native (JAX/flax, NHWC).

Behavioral reference: pytorchcv ``models/msdnet.py``
(MultiOutputSequential:15, MultiBlockSequential:39, MSDBaseBlock:65,
MSDFirstScaleBlock:118, MSDScaleBlock:156, MSDInitLayer:223, MSDLayer:264,
MSDTransitionLayer:338, MSDFeatureBlock:372, MSDClassifier:418,
MSDNet:463, get_msdnet:538) from 'Multi-Scale Dense Networks for Resource
Efficient Image Classification' https://arxiv.org/abs/1703.09844.

The multi-scale lattice is a static python structure — each scale column
is an ordinary conv graph, and the anytime classifiers are independent
heads (``only_last=False`` returns all exits)."""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import Sequential, avg_pool2d, conv1x1_block, conv3x3_block
from ..nn.arch import IndexedSeq
from ..nn.base import dense_kernel_init
from .registry import register_model
from .resnet import ResInitBlock

__all__ = ["MSDNet", "MSDFeatureBlock", "get_msdnet", "msdnet_channels"]


class MSDBaseBlock(nn.Module):
    """(bottleneck 1x1) + 3x3 conv block (reference msdnet.py:65)."""

    out_channels: int = 0
    stride: int = 1
    use_bottleneck: bool = True
    bottleneck_factor: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.use_bottleneck:
            mid_channels = min(x.shape[-1],
                               self.bottleneck_factor * self.out_channels)
            x = conv1x1_block(out_channels=mid_channels, name="bn_conv")(
                x, train=train)
        return conv3x3_block(out_channels=self.out_channels,
                             stride=self.stride, name="conv")(x, train=train)


class MSDFirstScaleBlock(nn.Module):
    """Dense growth on the finest scale (reference msdnet.py:118)."""

    out_channels: int = 0
    use_bottleneck: bool = True
    bottleneck_factor: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        inc_channels = self.out_channels - x.shape[-1]
        y = MSDBaseBlock(out_channels=inc_channels, stride=1,
                         use_bottleneck=self.use_bottleneck,
                         bottleneck_factor=self.bottleneck_factor,
                         name="block")(x, train=train)
        return jnp.concatenate([x, y], axis=-1)


class MSDScaleBlock(nn.Module):
    """Dense growth mixing the previous (finer) scale (reference
    msdnet.py:156)."""

    out_channels: int = 0
    use_bottleneck: bool = True
    bottleneck_factor_prev: int = 1
    bottleneck_factor: int = 1

    @nn.compact
    def __call__(self, x_prev, x_curr=None, train: bool = False):
        inc_channels = self.out_channels - x_curr.shape[-1]
        mid_channels = inc_channels // 2
        y_prev = MSDBaseBlock(out_channels=mid_channels, stride=2,
                              use_bottleneck=self.use_bottleneck,
                              bottleneck_factor=self.bottleneck_factor_prev,
                              name="down_block")(x_prev, train=train)
        y = MSDBaseBlock(out_channels=mid_channels, stride=1,
                         use_bottleneck=self.use_bottleneck,
                         bottleneck_factor=self.bottleneck_factor,
                         name="curr_block")(x_curr, train=train)
        return jnp.concatenate([x_curr, y_prev, y], axis=-1)


class MSDInitLayer(nn.Module):
    """Initial multi-scale pyramid (reference msdnet.py:223)."""

    out_channels: Any = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        blocks = []
        for i, out_channels_per_scale in enumerate(self.out_channels):
            if i == 0:
                blocks.append(ResInitBlock(
                    out_channels=out_channels_per_scale,
                    name=f"scale_block{i + 1}", parent=None))
            else:
                blocks.append(conv3x3_block(
                    out_channels=out_channels_per_scale, stride=2,
                    name=f"scale_block{i + 1}", parent=None))
        seq = IndexedSeq(layers=tuple(blocks), name="scale_blocks")
        outs = []
        for i in range(len(blocks)):
            x = seq(x, i, train=train)
            outs.append(x)
        return outs


class MSDLayer(nn.Module):
    """One dense lattice layer over all active scales (reference
    msdnet.py:264)."""

    in_scales: int = 4
    out_channels: Any = ()
    use_bottleneck: bool = True
    bottleneck_factors: Any = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_scales = len(self.out_channels)
        dec_scales = self.in_scales - out_scales
        assert dec_scales >= 0
        blocks = []
        for i in range(out_scales):
            if (i == 0) and (dec_scales == 0):
                blocks.append(MSDFirstScaleBlock(
                    out_channels=self.out_channels[i],
                    use_bottleneck=self.use_bottleneck,
                    bottleneck_factor=self.bottleneck_factors[
                        dec_scales + i],
                    name=f"scale_block{i + 1}", parent=None))
            else:
                blocks.append(MSDScaleBlock(
                    out_channels=self.out_channels[i],
                    use_bottleneck=self.use_bottleneck,
                    bottleneck_factor_prev=self.bottleneck_factors[
                        dec_scales + i - 1],
                    bottleneck_factor=self.bottleneck_factors[
                        dec_scales + i],
                    name=f"scale_block{i + 1}", parent=None))
        seq = IndexedSeq(layers=tuple(blocks), name="scale_blocks")
        outs = []
        for i in range(out_scales):
            if (i == 0) and (dec_scales == 0):
                y = seq(x[i], i, train=train)
            else:
                y = seq(x[dec_scales + i - 1], i, train=train,
                        x_curr=x[dec_scales + i])
            outs.append(y)
        return outs


class MSDTransitionLayer(nn.Module):
    """Per-scale 1x1 reduction (reference msdnet.py:338)."""

    out_channels: Any = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        blocks = tuple(conv1x1_block(out_channels=oc,
                                     name=f"scale_block{i + 1}",
                                     parent=None)
                       for i, oc in enumerate(self.out_channels))
        seq = IndexedSeq(layers=blocks, name="scale_blocks")
        return [seq(x[i], i, train=train) for i in range(len(blocks))]


class MSDFeatureBlock(nn.Module):
    """A cascade stage: layers + transitions (reference msdnet.py:372)."""

    in_scales: int = 4
    out_channels: Any = ()
    use_bottleneck: bool = True
    bottleneck_factors: Any = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_scales = self.in_scales
        blocks = []
        for i, out_channels_per_layer in enumerate(self.out_channels):
            if len(self.bottleneck_factors[i]) == 0:
                blocks.append(MSDTransitionLayer(
                    out_channels=tuple(out_channels_per_layer),
                    name=f"trans{i + 1}", parent=None))
            else:
                blocks.append(MSDLayer(
                    in_scales=in_scales,
                    out_channels=tuple(out_channels_per_layer),
                    use_bottleneck=self.use_bottleneck,
                    bottleneck_factors=tuple(self.bottleneck_factors[i]),
                    name=f"layer{i + 1}", parent=None))
            in_scales = len(out_channels_per_layer)
        seq = IndexedSeq(layers=tuple(blocks), name="blocks")
        for i in range(len(blocks)):
            x = seq(x, i, train=train)
        return x


class MSDClassifier(nn.Module):
    """Anytime-exit head (reference msdnet.py:418)."""

    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        x = Sequential(layers=(
            conv3x3_block(out_channels=in_channels, stride=2, name="conv1",
                          parent=None),
            conv3x3_block(out_channels=in_channels, stride=2, name="conv2",
                          parent=None),
            avg_pool2d(kernel_size=2, stride=2),
        ), name="features")(x, train=train)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.num_classes, kernel_init=dense_kernel_init,
                        name="output")(x)


class MSDNet(nn.Module):
    """MSDNet (reference msdnet.py:463)."""

    channels: Any = ()
    init_layer_channels: Any = ()
    num_feature_blocks: int = 10
    use_bottleneck: bool = True
    bottleneck_factors: Any = ()
    only_last: bool = True
    in_channels: int = 3
    in_size: Tuple[int, int] = (224, 224)
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = MSDInitLayer(out_channels=tuple(self.init_layer_channels),
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
            classifiers.append(MSDClassifier(
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


def msdnet_channels(blocks: int = 22, num_scales: int = 4,
                    num_feature_blocks: int = 10, growth: int = 6,
                    growth_factor=(1, 2, 4, 4),
                    bottleneck_factor_per_scales=(1, 2, 4, 4),
                    init_channels: int = 64, reduction_rate: float = 0.5,
                    base: int = 4, step: int = 2, step_mode: str = "even"):
    """Lattice schedule (reference get_msdnet:538 / get_msdnet_cifar10)."""
    init_layer_channels = [init_channels * c
                           for c in growth_factor[:num_scales]]
    layers_per_subnets = [base]
    for i in range(num_feature_blocks - 1):
        layers_per_subnets.append(
            step if step_mode == "even" else step * i + 1)
    total_layers = sum(layers_per_subnets)
    interval = math.ceil(total_layers / num_scales)
    global_layer_ind = 0
    channels, bottleneck_factors = [], []
    in_channels_tmp = init_layer_channels
    in_scales = num_scales
    for i in range(num_feature_blocks):
        layers_per_subnet = layers_per_subnets[i]
        scales_i, channels_i, bottleneck_factors_i = [], [], []
        for j in range(layers_per_subnet):
            out_scales = int(num_scales -
                             math.floor(global_layer_ind / interval))
            global_layer_ind += 1
            scales_i += [out_scales]
            scale_offset = num_scales - out_scales
            in_dec_scales = num_scales - len(in_channels_tmp)
            out_channels = [in_channels_tmp[scale_offset - in_dec_scales
                                            + k] +
                            growth * growth_factor[scale_offset + k]
                            for k in range(out_scales)]
            in_dec_scales = num_scales - len(in_channels_tmp)
            bottleneck_factors_ij = bottleneck_factor_per_scales[
                in_dec_scales:][:len(in_channels_tmp)]
            in_channels_tmp = out_channels
            channels_i += [out_channels]
            bottleneck_factors_i += [bottleneck_factors_ij]
            if in_scales > out_scales:
                assert in_channels_tmp[0] % \
                    growth_factor[scale_offset] == 0
                out_channels1 = int(math.floor(
                    in_channels_tmp[0] / growth_factor[scale_offset] *
                    reduction_rate))
                out_channels = [out_channels1 *
                                growth_factor[scale_offset + k]
                                for k in range(out_scales)]
                in_channels_tmp = out_channels
                channels_i += [out_channels]
                bottleneck_factors_i += [[]]
            in_scales = out_scales
        in_scales = scales_i[-1]
        channels += [channels_i]
        bottleneck_factors += [bottleneck_factors_i]
    return init_layer_channels, channels, bottleneck_factors


def get_msdnet(blocks: int, **kwargs) -> MSDNet:
    """Config expander (reference msdnet.py:538)."""
    assert blocks == 22
    init_layer_channels, channels, bottleneck_factors = msdnet_channels()
    return MSDNet(channels=channels,
                  init_layer_channels=init_layer_channels,
                  num_feature_blocks=10, use_bottleneck=True,
                  bottleneck_factors=bottleneck_factors, **kwargs)


@register_model("msdnet22")
def msdnet22(**kwargs):
    return get_msdnet(blocks=22, **kwargs)
