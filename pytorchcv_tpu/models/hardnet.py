"""HarDNet, TPU-native. Behavioral reference: pytorchcv ``models/hardnet.py``
(InvDwsConvBlock:14, invdwsconv3x3_block:84, HarDUnit:124, HarDInitBlock:219,
HarDNet:274, get_hardnet:377). Harmonic dense links computed at build time."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (Sequential, conv1x1_block, conv3x3_block, dwconv3x3_block,
                  global_avg_pool2d, max_pool2d)
from ..nn.activ import lambda_relu6
from .inceptionv3 import DropoutDense
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["HarDNet", "get_hardnet"]


class InvDwsConvBlock(nn.Module):
    """pw conv block then dw conv block (reference hardnet.py:14)."""

    out_channels: int = 0
    pw_activation: Any = None
    dw_activation: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv1x1_block(out_channels=self.out_channels,
                          activation=self.pw_activation,
                          name="pw_conv")(x, train=train)
        x = dwconv3x3_block(out_channels=self.out_channels,
                            activation=self.dw_activation,
                            name="dw_conv")(x, train=train)
        return x


class HarDBlocks(nn.Module):
    """The harmonic-link block stack; returns all layer outputs
    (reference hardnet.py:177-187, the ``blocks`` Sequential + traversal)."""

    out_channels_list: Tuple = ()
    links_list: Tuple = ()
    use_deptwise: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        activation = lambda_relu6()
        layer_outs = [x]
        for i, links_i in enumerate(self.links_list):
            layer_in = [layer_outs[idx] for idx in links_i]
            h = jnp.concatenate(layer_in, axis=-1) if len(layer_in) > 1 \
                else layer_in[0]
            if self.use_deptwise:
                blk = InvDwsConvBlock(
                    out_channels=self.out_channels_list[i],
                    pw_activation=activation, dw_activation=None,
                    name=f"block{i + 1}")
            else:
                blk = conv3x3_block(
                    out_channels=self.out_channels_list[i],
                    name=f"block{i + 1}")
            layer_outs.append(blk(h, train=train))
        return layer_outs


class HarDUnitImpl(nn.Module):
    """Harmonic dense unit (reference hardnet.py:124)."""

    out_channels_list: Tuple = ()
    links_list: Tuple = ()
    use_deptwise: bool = True
    use_dropout: bool = False
    downsampling: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        activation = lambda_relu6()
        layer_outs = HarDBlocks(
            out_channels_list=self.out_channels_list,
            links_list=self.links_list, use_deptwise=self.use_deptwise,
            name="blocks")(x, train=train)
        outs = [o for i, o in enumerate(layer_outs)
                if (i == len(layer_outs) - 1) or (i % 2 == 1)]
        x = jnp.concatenate(outs, axis=-1)
        if self.use_dropout:
            x = nn.Dropout(rate=0.1, deterministic=not train)(x)
        x = conv1x1_block(out_channels=self.out_channels_list[-1],
                          activation=activation,
                          name="conv")(x, train=train)
        if self.downsampling:
            if self.use_deptwise:
                x = dwconv3x3_block(out_channels=self.out_channels_list[-1],
                                    stride=2, activation=None,
                                    name="downsample")(x, train=train)
            else:
                x = max_pool2d(2, 2)(x)
        return x


class HarDInitBlock(nn.Module):
    """HarDNet stem (reference hardnet.py:219)."""

    out_channels: int = 0
    use_deptwise: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        activation = lambda_relu6()
        mid_channels = self.out_channels // 2
        x = conv3x3_block(out_channels=mid_channels, stride=2,
                          activation=activation, name="conv1")(x, train=train)
        blk = conv1x1_block if self.use_deptwise else conv3x3_block
        x = blk(out_channels=self.out_channels, activation=activation,
                name="conv2")(x, train=train)
        if self.use_deptwise:
            x = dwconv3x3_block(out_channels=self.out_channels, stride=2,
                                activation=None,
                                name="downsample")(x, train=train)
        else:
            x = max_pool2d(3, 2, padding=1)(x)
        return x


def HarDNet(init_block_channels: int, unit_in_channels, unit_out_channels,
            unit_links, use_deptwise: bool, use_last_dropout: bool,
            output_dropout_rate: float, in_channels: int = 3,
            in_size: Tuple[int, int] = (224, 224),
            num_classes: int = 1000) -> ImageClassifier:
    """HarDNet (reference hardnet.py:274)."""
    del unit_in_channels  # shapes are traced; only links/outs are needed
    layers = [HarDInitBlock(out_channels=init_block_channels,
                            use_deptwise=use_deptwise, name="init_block")]
    for i, out_channels_list_i in enumerate(unit_out_channels):
        units = []
        for j, out_channels_list_ij in enumerate(out_channels_list_i):
            use_dropout = ((j == len(out_channels_list_i) - 1) and
                           (i == len(unit_out_channels) - 1) and
                           use_last_dropout)
            downsampling = ((j == len(out_channels_list_i) - 1) and
                            (i != len(unit_out_channels) - 1))
            units.append(HarDUnitImpl(
                out_channels_list=tuple(out_channels_list_ij),
                links_list=tuple(tuple(l) for l in unit_links[i][j]),
                use_deptwise=use_deptwise, use_dropout=use_dropout,
                downsampling=downsampling, name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=DropoutDense(num_classes=num_classes,
                            dropout_rate=output_dropout_rate, name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_hardnet(blocks: int, use_deptwise: bool = True, **kwargs):
    """Config expander (reference hardnet.py:377)."""
    if blocks == 39:
        init_block_channels = 48
        growth_factor = 1.6
        dropout_rate = 0.05 if use_deptwise else 0.1
        layers = [4, 16, 8, 4]
        channels_per_layers = [96, 320, 640, 1024]
        growth_rates = [16, 20, 64, 160]
        downsamples = [1, 1, 1, 0]
        use_dropout = False
    elif blocks == 68:
        init_block_channels = 64
        growth_factor = 1.7
        dropout_rate = 0.05 if use_deptwise else 0.1
        layers = [8, 16, 16, 16, 4]
        channels_per_layers = [128, 256, 320, 640, 1024]
        growth_rates = [14, 16, 20, 40, 160]
        downsamples = [1, 0, 1, 1, 0]
        use_dropout = False
    elif blocks == 85:
        init_block_channels = 96
        growth_factor = 1.7
        dropout_rate = 0.05 if use_deptwise else 0.2
        layers = [8, 16, 16, 16, 16, 4]
        channels_per_layers = [192, 256, 320, 480, 720, 1280]
        growth_rates = [24, 24, 28, 36, 48, 256]
        downsamples = [1, 0, 1, 0, 1, 0]
        use_dropout = True
    else:
        raise ValueError(f"Unsupported HarDNet blocks: {blocks}")

    def calc_blocks_params(layer_idx, base_channels, growth_rate):
        if layer_idx == 0:
            return base_channels, 0, []
        out_channels_ij = growth_rate
        links_ij = []
        for k in range(10):
            dv = 2 ** k
            if layer_idx % dv == 0:
                links_ij.append(layer_idx - dv)
                if k > 0:
                    out_channels_ij *= growth_factor
        out_channels_ij = int(int(out_channels_ij + 1) / 2) * 2
        in_channels_ij = 0
        for t in links_ij:
            oc, _, _ = calc_blocks_params(t, base_channels, growth_rate)
            in_channels_ij += oc
        return out_channels_ij, in_channels_ij, links_ij

    unit_out_channels, unit_in_channels, unit_links = [], [], []
    for num_layers, growth_rate, base_channels, cpl_i in zip(
            layers, growth_rates,
            [init_block_channels] + channels_per_layers[:-1],
            channels_per_layers):
        stage_out = 0
        uoc, uic, ul = [], [], []
        for j in range(num_layers):
            oc, ic, links = calc_blocks_params(j + 1, base_channels,
                                               growth_rate)
            uoc.append(oc)
            uic.append(ic)
            ul.append(links)
            if (j % 2 == 0) or (j == num_layers - 1):
                stage_out += oc
        uic.append(stage_out)
        uoc.append(cpl_i)
        unit_out_channels.append(uoc)
        unit_in_channels.append(uic)
        unit_links.append(ul)

    stage_out_channels, stage_in_channels, stage_links = [], [], []
    sk_out, sk_in, sk_links = None, None, None
    for i in range(len(layers)):
        if sk_out is None:
            sk_out, sk_in, sk_links = [], [], []
        sk_out.append(unit_out_channels[i])
        sk_in.append(unit_in_channels[i])
        sk_links.append(unit_links[i])
        if (downsamples[i] == 1) or (i == len(layers) - 1):
            stage_out_channels.append(sk_out)
            stage_in_channels.append(sk_in)
            stage_links.append(sk_links)
            sk_out = None

    return HarDNet(init_block_channels=init_block_channels,
                   unit_in_channels=stage_in_channels,
                   unit_out_channels=stage_out_channels,
                   unit_links=stage_links, use_deptwise=use_deptwise,
                   use_last_dropout=use_dropout,
                   output_dropout_rate=dropout_rate, **kwargs)


@register_model("hardnet39ds")
def hardnet39ds(**kwargs):
    return get_hardnet(blocks=39, use_deptwise=True, **kwargs)


@register_model("hardnet68ds")
def hardnet68ds(**kwargs):
    return get_hardnet(blocks=68, use_deptwise=True, **kwargs)


@register_model("hardnet68")
def hardnet68(**kwargs):
    return get_hardnet(blocks=68, use_deptwise=False, **kwargs)


@register_model("hardnet85")
def hardnet85(**kwargs):
    return get_hardnet(blocks=85, use_deptwise=False, **kwargs)
