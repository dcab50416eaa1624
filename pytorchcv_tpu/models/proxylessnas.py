"""ProxylessNAS, TPU-native. Behavioral reference: pytorchcv
``models/proxylessnas.py`` (ProxylessBlock:18, ProxylessUnit:82,
ProxylessNAS:143, get_proxylessnas:253). BN eps 1e-3; relu6."""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import (ConvBlock, Sequential, conv1x1_block, conv3x3_block,
                  global_avg_pool2d, lambda_batchnorm2d, lambda_relu6)
from ..nn.base import IntPair, dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["ProxylessNAS", "get_proxylessnas"]

_NORM = lambda_batchnorm2d(eps=1e-3)
_ACT = lambda_relu6()


class ProxylessBlock(nn.Module):
    """[bc 1x1] -> dw kxk -> pw 1x1 (reference proxylessnas.py:18)."""

    out_channels: int = 0
    kernel_size: int = 3
    stride: IntPair = 1
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        mid_channels = in_channels * self.expansion
        if self.expansion > 1:
            x = conv1x1_block(out_channels=mid_channels, normalization=_NORM,
                              activation=_ACT, name="bc_conv")(x, train=train)
        padding = (self.kernel_size - 1) // 2
        x = ConvBlock(out_channels=mid_channels,
                      kernel_size=self.kernel_size, stride=self.stride,
                      padding=padding, groups=mid_channels,
                      normalization=_NORM, activation=_ACT,
                      name="dw_conv")(x, train=train)
        x = conv1x1_block(out_channels=self.out_channels,
                          normalization=_NORM, activation=None,
                          name="pw_conv")(x, train=train)
        return x


class ProxylessUnit(nn.Module):
    """NAS cell: identity / body / body+shortcut
    (reference proxylessnas.py:82)."""

    out_channels: int = 0
    kernel_size: int = 3
    stride: IntPair = 1
    expansion: int = 1
    residual: bool = True
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.residual or self.shortcut
        if not self.residual:
            return x
        body = ProxylessBlock(out_channels=self.out_channels,
                              kernel_size=self.kernel_size,
                              stride=self.stride, expansion=self.expansion,
                              name="body")
        if not self.shortcut:
            return body(x, train=train)
        return x + body(x, train=train)


def ProxylessNAS(channels, init_block_channels: int,
                 final_block_channels: int, residuals, shortcuts,
                 kernel_sizes, expansions, in_channels: int = 3,
                 in_size: Tuple[int, int] = (224, 224),
                 num_classes: int = 1000) -> ImageClassifier:
    """ProxylessNAS (reference proxylessnas.py:143)."""
    layers = [conv3x3_block(out_channels=init_block_channels, stride=2,
                            normalization=_NORM, activation=_ACT,
                            name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            units.append(ProxylessUnit(
                out_channels=out_channels,
                kernel_size=kernel_sizes[i][j],
                stride=2 if (j == 0) and (i != 0) else 1,
                expansion=expansions[i][j],
                residual=residuals[i][j] == 1,
                shortcut=shortcuts[i][j] == 1, name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(conv1x1_block(out_channels=final_block_channels,
                                normalization=_NORM, activation=_ACT,
                                name="final_block"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


_CONFIGS = {
    "cpu": dict(
        residuals=[[1], [1, 1, 1, 1], [1, 1, 1, 1],
                   [1, 0, 0, 1, 1, 1, 1, 1], [1, 1, 1, 1, 1]],
        channels=[[24], [32, 32, 32, 32], [48, 48, 48, 48],
                  [88, 88, 88, 88, 104, 104, 104, 104],
                  [216, 216, 216, 216, 360]],
        kernel_sizes=[[3], [3, 3, 3, 3], [3, 3, 3, 5],
                      [3, 3, 3, 3, 5, 3, 3, 3], [5, 5, 5, 3, 5]],
        expansions=[[1], [6, 3, 3, 3], [6, 3, 3, 3],
                    [6, 3, 3, 3, 6, 3, 3, 3], [6, 3, 3, 3, 6]],
        init_block_channels=40, final_block_channels=1432),
    "gpu": dict(
        residuals=[[1], [1, 0, 0, 0], [1, 0, 0, 1],
                   [1, 0, 0, 1, 1, 0, 1, 1], [1, 1, 1, 1, 1]],
        channels=[[24], [32, 32, 32, 32], [56, 56, 56, 56],
                  [112, 112, 112, 112, 128, 128, 128, 128],
                  [256, 256, 256, 256, 432]],
        kernel_sizes=[[3], [5, 3, 3, 3], [7, 3, 3, 3],
                      [7, 5, 5, 5, 5, 3, 3, 5], [7, 7, 7, 5, 7]],
        expansions=[[1], [3, 3, 3, 3], [3, 3, 3, 3],
                    [6, 3, 3, 3, 6, 3, 3, 3], [6, 6, 6, 6, 6]],
        init_block_channels=40, final_block_channels=1728),
    "mobile": dict(
        residuals=[[1], [1, 1, 0, 0], [1, 1, 1, 1],
                   [1, 1, 1, 1, 1, 1, 1, 1], [1, 1, 1, 1, 1]],
        channels=[[16], [32, 32, 32, 32], [40, 40, 40, 40],
                  [80, 80, 80, 80, 96, 96, 96, 96],
                  [192, 192, 192, 192, 320]],
        kernel_sizes=[[3], [5, 3, 3, 3], [7, 3, 5, 5],
                      [7, 5, 5, 5, 5, 5, 5, 5], [7, 7, 7, 7, 7]],
        expansions=[[1], [3, 3, 3, 3], [3, 3, 3, 3],
                    [6, 3, 3, 3, 6, 3, 3, 3], [6, 6, 3, 3, 6]],
        init_block_channels=32, final_block_channels=1280),
    "mobile14": dict(
        residuals=[[1], [1, 1, 0, 0], [1, 1, 1, 1],
                   [1, 1, 1, 1, 1, 1, 1, 1], [1, 1, 1, 1, 1]],
        channels=[[24], [40, 40, 40, 40], [56, 56, 56, 56],
                  [112, 112, 112, 112, 136, 136, 136, 136],
                  [256, 256, 256, 256, 448]],
        kernel_sizes=[[3], [5, 3, 3, 3], [7, 3, 5, 5],
                      [7, 5, 5, 5, 5, 5, 5, 5], [7, 7, 7, 7, 7]],
        expansions=[[1], [3, 3, 3, 3], [3, 3, 3, 3],
                    [6, 3, 3, 3, 6, 3, 3, 3], [6, 6, 3, 3, 6]],
        init_block_channels=48, final_block_channels=1792),
}


def get_proxylessnas(version: str, **kwargs):
    """Config expander (reference proxylessnas.py:253)."""
    if version not in _CONFIGS:
        raise ValueError(f"Unsupported ProxylessNAS version {version}")
    cfg = dict(_CONFIGS[version])
    cfg["shortcuts"] = [[0], [0, 1, 1, 1], [0, 1, 1, 1],
                        [0, 1, 1, 1, 0, 1, 1, 1], [0, 1, 1, 1, 0]]
    return ProxylessNAS(**cfg, **kwargs)


def _variant(name, version):
    @register_model(name)
    def ctor(**kwargs):
        return get_proxylessnas(version=version, **kwargs)
    ctor.__name__ = name
    return ctor


proxylessnas_cpu = _variant("proxylessnas_cpu", "cpu")
proxylessnas_gpu = _variant("proxylessnas_gpu", "gpu")
proxylessnas_mobile = _variant("proxylessnas_mobile", "mobile")
proxylessnas_mobile14 = _variant("proxylessnas_mobile14", "mobile14")
