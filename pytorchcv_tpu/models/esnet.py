"""ESNet, TPU-native. Behavioral reference: pytorchcv ``models/esnet.py``
(PFCUBranch:16, PFCU:55, ESNet:109, get_esnet:260)."""

from __future__ import annotations

from typing import Any, Tuple

from flax import linen as nn

from ..nn import AsymConvBlock, Concurrent, Sequential, deconv3x3_block
from ..nn.base import Composed
from ..nn.conv import ConvTranspose2d
from ..nn.norm import lambda_batchnorm2d
from .enet import ENetMixDownBlock
from .erfnet import FCU
from .registry import register_model

__all__ = ["ESNet", "get_esnet"]


class PFCUBranch(nn.Module):
    """Dilated asym-conv branch (reference esnet.py:16)."""

    channels: int = 0
    kernel_size: int = 3
    dilation: int = 1
    dropout_rate: float = 0.0
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = AsymConvBlock(channels=self.channels,
                          kernel_size=self.kernel_size,
                          padding=self.dilation, dilation=self.dilation,
                          bias=True, lw_use_bn=False,
                          normalization=lambda_batchnorm2d(eps=self.bn_eps),
                          rw_activation=None, name="conv")(x, train=train)
        if self.dropout_rate != 0.0:
            x = nn.Dropout(rate=self.dropout_rate,
                           deterministic=not train)(x)
        return x


class PFCU(nn.Module):
    """Parallel factorized conv unit (reference esnet.py:55)."""

    channels: int = 0
    kernel_size: int = 3
    dropout_rate: float = 0.0
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        padding = (self.kernel_size - 1) // 2
        x = AsymConvBlock(channels=self.channels,
                          kernel_size=self.kernel_size, padding=padding,
                          bias=True, lw_use_bn=False,
                          normalization=lambda_batchnorm2d(eps=self.bn_eps),
                          name="conv1")(x, train=train)
        x = Concurrent(layers=tuple(
            PFCUBranch(channels=self.channels, kernel_size=self.kernel_size,
                       dilation=d, dropout_rate=self.dropout_rate,
                       bn_eps=self.bn_eps, name=f"branch{i + 1}",
                       parent=None)
            for i, d in enumerate([2, 5, 9])),
            merge_type="sum", name="branches")(x, train=train)
        return nn.relu(x + identity)


class ESNet(Composed):
    """ESNet (reference esnet.py:109)."""

    layers: Any = None
    channels: Any = None
    kernel_sizes: Any = None
    dropout_rates: Any = None
    correct_size_mismatch: bool = False
    bn_eps: float = 1e-5
    aux: bool = False
    fixed_size: bool = False
    in_size: Tuple[int, int] = (1024, 2048)
    in_channels: int = 3
    num_classes: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = self.in_channels
        enc_stages = []
        for i, layers_per_stage in enumerate(self.layers[0]):
            out_channels = self.channels[0][i]
            ks = self.kernel_sizes[0][i]
            dr = self.dropout_rates[0][i]
            units = []
            for j in range(layers_per_stage):
                if j == 0:
                    units.append(ENetMixDownBlock(
                        out_channels=out_channels, bias=True,
                        bn_eps=self.bn_eps,
                        correct_size_mismatch=self.correct_size_mismatch,
                        name="unit1", parent=None))
                    in_channels = out_channels
                elif i != len(self.layers[0]) - 1:
                    units.append(FCU(channels=in_channels, kernel_size=ks,
                                     dilation=1, dropout_rate=dr,
                                     bn_eps=self.bn_eps,
                                     name=f"unit{j + 1}", parent=None))
                else:
                    units.append(PFCU(channels=in_channels, kernel_size=ks,
                                      dropout_rate=dr, bn_eps=self.bn_eps,
                                      name=f"unit{j + 1}", parent=None))
            enc_stages.append(Sequential(layers=tuple(units),
                                         name=f"stage{i + 1}", parent=None))
        x = Sequential(layers=tuple(enc_stages),
                       name="encoder")(x, train=train)
        dec_stages = []
        for i, layers_per_stage in enumerate(self.layers[1]):
            out_channels = self.channels[1][i]
            ks = self.kernel_sizes[1][i]
            units = []
            for j in range(layers_per_stage):
                if j == 0:
                    units.append(deconv3x3_block(
                        out_channels=out_channels, stride=2, bias=True,
                        normalization=lambda_batchnorm2d(eps=self.bn_eps),
                        name="unit1", parent=None))
                    in_channels = out_channels
                else:
                    units.append(FCU(channels=in_channels, kernel_size=ks,
                                     dilation=1, dropout_rate=0.0,
                                     bn_eps=self.bn_eps,
                                     name=f"unit{j + 1}", parent=None))
            dec_stages.append(Sequential(layers=tuple(units),
                                         name=f"stage{i + 1}", parent=None))
        x = Sequential(layers=tuple(dec_stages),
                       name="decoder")(x, train=train)
        return ConvTranspose2d(out_channels=self.num_classes, kernel_size=2,
                               stride=2, padding=0, bias=True,
                               name="head")(x)


def get_esnet(**kwargs):
    """Config expander (reference esnet.py:260)."""
    layers = [[4, 3, 4], [3, 3]]
    channels = [[16, 64, 128], [64, 16]]
    kernel_sizes = [[3, 5, 3], [5, 3]]
    dropout_rates = [[0.03, 0.03, 0.3], [0, 0]]
    return ESNet(layers=layers, channels=channels,
                 kernel_sizes=kernel_sizes, dropout_rates=dropout_rates,
                 bn_eps=kwargs.pop("bn_eps", 1e-3), **kwargs)


@register_model("esnet_cityscapes")
def esnet_cityscapes(num_classes: int = 19, **kwargs):
    return get_esnet(num_classes=num_classes, **kwargs)
