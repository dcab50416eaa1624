"""Fast-SE-ResNet, TPU-native. Behavioral reference: pytorchcv
``models/fastseresnet.py`` (FastSEResUnit:12, FastSEResNet:84,
get_fastseresnet:160, fastseresnet101b:243). SE applied only on the first
unit of each stage, with FC parameterization and reduction 1."""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..nn import SEBlock, Sequential, conv1x1_block, global_avg_pool2d
from ..nn.base import dense_kernel_init
from .registry import register_model
from .resnet import ResBlock, ResBottleneck, ResInitBlock
from .shell import ImageClassifier

__all__ = ["FastSEResNet", "get_fastseresnet", "fastseresnet_features"]


class FastSEResUnit(nn.Module):
    """Residual unit with optional fast-SE gate
    (reference fastseresnet.py:12)."""

    out_channels: int = 0
    stride: int = 1
    bottleneck: bool = True
    conv1_stride: bool = False
    use_se: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        resize_identity = (in_channels != self.out_channels) or \
            (self.stride != 1)
        if resize_identity:
            identity = conv1x1_block(
                out_channels=self.out_channels, stride=self.stride,
                activation=None, name="identity_conv")(x, train=train)
        else:
            identity = x
        if self.bottleneck:
            x = ResBottleneck(out_channels=self.out_channels,
                              stride=self.stride,
                              conv1_stride=self.conv1_stride,
                              name="body")(x, train=train)
        else:
            x = ResBlock(out_channels=self.out_channels, stride=self.stride,
                         name="body")(x, train=train)
        if self.use_se:
            x = SEBlock(channels=self.out_channels, reduction=1,
                        use_conv=False, name="se")(x)
        return nn.relu(x + identity)


def fastseresnet_features(channels, init_block_channels: int,
                          bottleneck: bool, conv1_stride: bool,
                          final_pool: bool = True) -> Sequential:
    layers = [ResInitBlock(out_channels=init_block_channels,
                           name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(FastSEResUnit(
                out_channels=out_channels, stride=stride,
                bottleneck=bottleneck, conv1_stride=conv1_stride,
                use_se=(j == 0), name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    if final_pool:
        layers.append(global_avg_pool2d())
    return Sequential(layers=tuple(layers), name="features")


def FastSEResNet(channels, init_block_channels: int, bottleneck: bool,
                 conv1_stride: bool, in_channels: int = 3,
                 in_size: Tuple[int, int] = (224, 224),
                 num_classes: int = 1000) -> ImageClassifier:
    """Fast-SE-ResNet (reference fastseresnet.py:84)."""
    return ImageClassifier(
        features=fastseresnet_features(channels, init_block_channels,
                                       bottleneck, conv1_stride),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_fastseresnet(blocks: int, conv1_stride: bool = True, **kwargs):
    """Config expander (reference fastseresnet.py:160)."""
    if blocks != 101:
        raise ValueError(f"Unsupported Fast-SE-ResNet blocks: {blocks}")
    layers = [3, 4, 23, 3]
    channels = [[ci] * li for ci, li in
                zip([256, 512, 1024, 2048], layers)]
    return FastSEResNet(channels=channels, init_block_channels=64,
                        bottleneck=True, conv1_stride=conv1_stride, **kwargs)


@register_model("fastseresnet101b")
def fastseresnet101b(**kwargs):
    return get_fastseresnet(blocks=101, conv1_stride=False, **kwargs)
