"""VGG, TPU-native. Behavioral reference: pytorchcv ``models/vgg.py``
(VGGDense:16, VGGOutputBlock:45, VGG:79, get_vgg:147). Bias-ful 3x3 convs;
4096-wide FC head with dropout; 12 registered variants incl. BN ones.
"""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import Sequential, conv3x3_block, lambda_batchnorm2d, max_pool2d
from ..nn.base import dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["VGG", "get_vgg"]


class VGGDense(nn.Module):
    """fc + relu + dropout (reference vgg.py:16)."""

    out_features: int = 4096

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.out_features, kernel_init=dense_kernel_init,
                     name="fc")(x)
        x = nn.relu(x)
        if train:
            x = nn.Dropout(rate=0.5, deterministic=False,
                           name="dropout")(x)
        return x


class VGGOutputBlock(nn.Module):
    """fc1 -> fc2 -> fc3 (reference vgg.py:45)."""

    classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = VGGDense(name="fc1")(x, train=train)
        x = VGGDense(name="fc2")(x, train=train)
        x = nn.Dense(self.classes, kernel_init=dense_kernel_init,
                     name="fc3")(x)
        return x


def VGG(channels, bias: bool = True, use_bn: bool = False,
        in_channels: int = 3, in_size: Tuple[int, int] = (224, 224),
        num_classes: int = 1000) -> ImageClassifier:
    """VGG (reference vgg.py:79)."""
    normalization = lambda_batchnorm2d() if use_bn else None
    stages = []
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            units.append(conv3x3_block(out_channels=out_channels, bias=bias,
                                       normalization=normalization,
                                       name=f"unit{j + 1}"))
        units.append(max_pool2d(2, 2, 0))
        stages.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    return ImageClassifier(
        features=Sequential(layers=tuple(stages), name="features"),
        output=VGGOutputBlock(classes=num_classes, name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_vgg(blocks: int, bias: bool = True, use_bn: bool = False, **kwargs):
    """Config expander (reference vgg.py:147)."""
    layers_table = {11: [1, 1, 2, 2, 2], 13: [2, 2, 2, 2, 2],
                    16: [2, 2, 3, 3, 3], 19: [2, 2, 4, 4, 4]}
    if blocks not in layers_table:
        raise ValueError(f"Unsupported VGG blocks: {blocks}")
    layers = layers_table[blocks]
    channels_per_layers = [64, 128, 256, 512, 512]
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    return VGG(channels=channels, bias=bias, use_bn=use_bn, **kwargs)


def _variant(name, **cfg):
    @register_model(name)
    def ctor(**kwargs):
        return get_vgg(**cfg, **kwargs)
    ctor.__name__ = name
    return ctor


vgg11 = _variant("vgg11", blocks=11)
vgg13 = _variant("vgg13", blocks=13)
vgg16 = _variant("vgg16", blocks=16)
vgg19 = _variant("vgg19", blocks=19)
bn_vgg11 = _variant("bn_vgg11", blocks=11, bias=False, use_bn=True)
bn_vgg13 = _variant("bn_vgg13", blocks=13, bias=False, use_bn=True)
bn_vgg16 = _variant("bn_vgg16", blocks=16, bias=False, use_bn=True)
bn_vgg19 = _variant("bn_vgg19", blocks=19, bias=False, use_bn=True)
bn_vgg11b = _variant("bn_vgg11b", blocks=11, bias=True, use_bn=True)
bn_vgg13b = _variant("bn_vgg13b", blocks=13, bias=True, use_bn=True)
bn_vgg16b = _variant("bn_vgg16b", blocks=16, bias=True, use_bn=True)
bn_vgg19b = _variant("bn_vgg19b", blocks=19, bias=True, use_bn=True)
