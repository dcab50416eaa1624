"""ERFNet, TPU-native. Behavioral reference: pytorchcv ``models/erfnet.py``
(FCU:15, ERFNet:85, get_erfnet:195)."""

from __future__ import annotations

from typing import Any, Tuple

from flax import linen as nn

from ..nn import AsymConvBlock, Sequential, deconv3x3_block
from ..nn.base import Composed
from ..nn.conv import ConvTranspose2d
from ..nn.norm import lambda_batchnorm2d
from .enet import ENetMixDownBlock
from .registry import register_model

__all__ = ["ERFNet", "get_erfnet", "FCU"]


class FCU(nn.Module):
    """Factorized convolution unit (reference erfnet.py:15)."""

    channels: int = 0
    kernel_size: int = 3
    dilation: int = 1
    dropout_rate: float = 0.0
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        padding1 = (self.kernel_size - 1) // 2
        padding2 = padding1 * self.dilation
        nm = lambda_batchnorm2d(eps=self.bn_eps)
        x = AsymConvBlock(channels=self.channels,
                          kernel_size=self.kernel_size, padding=padding1,
                          bias=True, lw_use_bn=False, normalization=nm,
                          name="conv1")(x, train=train)
        x = AsymConvBlock(channels=self.channels,
                          kernel_size=self.kernel_size, padding=padding2,
                          dilation=self.dilation, bias=True, lw_use_bn=False,
                          normalization=nm, rw_activation=None,
                          name="conv2")(x, train=train)
        if self.dropout_rate != 0.0:
            x = nn.Dropout(rate=self.dropout_rate,
                           deterministic=not train)(x)
        return nn.relu(x + identity)


class ERFNet(Composed):
    """ERFNet (reference erfnet.py:85)."""

    channels: Any = None
    dilations: Any = None
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
        bias = True
        in_channels = self.in_channels
        enc_stages, dec_stages = [], []
        enc_idx = dec_idx = 0
        for i, out_channels in enumerate(self.channels):
            is_down = self.downs[i]
            units = []
            for j, dilation in enumerate(self.dilations[i]):
                if j == 0:
                    if is_down:
                        units.append(ENetMixDownBlock(
                            out_channels=out_channels, bias=bias,
                            bn_eps=self.bn_eps,
                            correct_size_mismatch=self.correct_size_mismatch,
                            name="unit1", parent=None))
                    else:
                        units.append(deconv3x3_block(
                            out_channels=out_channels, stride=2, bias=bias,
                            normalization=lambda_batchnorm2d(
                                eps=self.bn_eps),
                            name="unit1", parent=None))
                else:
                    units.append(FCU(
                        channels=in_channels, kernel_size=3,
                        dilation=dilation,
                        dropout_rate=self.dropout_rates[i][j],
                        bn_eps=self.bn_eps, name=f"unit{j + 1}",
                        parent=None))
                in_channels = out_channels
            stage = Sequential(layers=tuple(units),
                               name=(f"stage{enc_idx + 1}" if is_down
                                     else f"stage{dec_idx + 1}"),
                               parent=None)
            if is_down:
                enc_idx += 1
                enc_stages.append(stage)
            else:
                dec_idx += 1
                dec_stages.append(stage)
        x = Sequential(layers=tuple(enc_stages),
                       name="encoder")(x, train=train)
        x = Sequential(layers=tuple(dec_stages),
                       name="decoder")(x, train=train)
        return ConvTranspose2d(out_channels=self.num_classes, kernel_size=2,
                               stride=2, padding=0, bias=True,
                               name="head")(x)


def get_erfnet(**kwargs):
    """Config expander (reference erfnet.py:195)."""
    downs = [1, 1, 1, 0, 0]
    channels = [16, 64, 128, 64, 16]
    dilations = [[1], [1, 1, 1, 1, 1, 1], [1, 2, 4, 8, 16, 2, 4, 8, 16],
                 [1, 1, 1], [1, 1, 1]]
    dropout_rates = [[0.0], [0.03] * 6, [0.3] * 9, [0.0] * 3, [0.0] * 3]
    return ERFNet(channels=channels, dilations=dilations,
                  dropout_rates=dropout_rates, downs=downs, **kwargs)


@register_model("erfnet_cityscapes")
def erfnet_cityscapes(num_classes: int = 19, **kwargs):
    return get_erfnet(num_classes=num_classes, **kwargs)
