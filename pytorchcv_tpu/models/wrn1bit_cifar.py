"""WRN-1bit for CIFAR/SVHN, TPU-native. Behavioral reference: pytorchcv
``models/wrn1bit_cifar.py`` (Binarize:17, Conv2d1bit:31, ConvBlock1bit:128,
PreConvBlock1bit:217, PreResBlock1bit:302, PreResUnit1bit:341,
CIFARWRN1bit:404, get_wrn1bit_cifar:478).

``binarize`` is a ``jax.custom_vjp`` straight-through estimator:
forward sign-quantizes with a fan-in scale, backward is identity."""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import BatchNorm, Sequential, avg_pool2d
from ..nn.base import conv_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["CIFARWRN1bit", "get_wrn1bit_cifar", "binarize"]


@jax.custom_vjp
def binarize(x):
    """Fake-sign quantization with identity gradient (STE; reference
    wrn1bit_cifar.py:17-28). Scale uses the torch OIHW fan-in
    (in_channels * kh * kw) = HWIO shape[0]*shape[1]*shape[2]."""
    fan = x.shape[0] * x.shape[1] * x.shape[2]
    return math.sqrt(2.0 / fan) * jnp.sign(x)


def _bin_fwd(x):
    return binarize(x), None


def _bin_bwd(_, dy):
    return (dy,)


binarize.defvjp(_bin_fwd, _bin_bwd)


class Conv2d1bit(nn.Module):
    """Conv with optional weight binarization (reference
    wrn1bit_cifar.py:31)."""

    out_channels: int = 0
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    bias: bool = False
    binarized: bool = False

    @nn.compact
    def __call__(self, x):
        kh = kw = self.kernel_size
        kernel = self.param("kernel", conv_kernel_init,
                            (kh, kw, x.shape[-1], self.out_channels))
        w = binarize(kernel) if self.binarized else kernel
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(self.stride,) * 2,
            padding=((self.padding,) * 2,) * 2,
            rhs_dilation=(self.dilation,) * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.out_channels,))
            if self.binarized:
                b = binarize(b[None, None, :, None])[0, 0, :, 0]
            y = y + b.astype(y.dtype)
        return y


class PreConvBlock1bit(nn.Module):
    """BN(affine flag) -> ReLU -> 1-bit conv (reference
    wrn1bit_cifar.py:217)."""

    out_channels: int = 0
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    bn_affine: bool = True
    binarized: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(use_scale=self.bn_affine, use_bias=self.bn_affine,
                      name="bn")(x, train=train)
        x = nn.relu(x)
        x = Conv2d1bit(out_channels=self.out_channels,
                       kernel_size=self.kernel_size, stride=self.stride,
                       padding=self.padding, binarized=self.binarized,
                       name="conv")(x)
        return x


class PreResUnit1bit(nn.Module):
    """PreResNet unit with zero-pad channel-doubling identity
    (reference wrn1bit_cifar.py:341)."""

    out_channels: int = 0
    stride: int = 1
    binarized: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = Sequential(layers=(
            PreConvBlock1bit(out_channels=self.out_channels,
                             stride=self.stride, bn_affine=False,
                             binarized=self.binarized, name="conv1",
                             parent=None),
            PreConvBlock1bit(out_channels=self.out_channels,
                             bn_affine=False, binarized=self.binarized,
                             name="conv2", parent=None),
        ), name="body")(x, train=train)
        if self.stride != 1:
            identity = avg_pool2d(3, 2, padding=1)(identity)
            identity = jnp.concatenate(
                [identity, jnp.zeros_like(identity)], axis=-1)
        return y + identity


class WRN1bitOutput(nn.Module):
    """1-bit 1x1 conv head + pool (reference wrn1bit_cifar.py:449-456)."""

    num_classes: int = 10
    binarized: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _ConvBlock1bit(out_channels=self.num_classes, kernel_size=1,
                           padding=0, activate=False,
                           binarized=self.binarized,
                           name="final_conv")(x, train=train)
        return x.mean(axis=(1, 2), keepdims=True)


class _ConvBlock1bit(nn.Module):
    """1-bit conv + BN [+ ReLU] (reference wrn1bit_cifar.py:128)."""

    out_channels: int = 0
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    bn_affine: bool = True
    activate: bool = True
    binarized: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d1bit(out_channels=self.out_channels,
                       kernel_size=self.kernel_size, stride=self.stride,
                       padding=self.padding, binarized=self.binarized,
                       name="conv")(x)
        x = BatchNorm(use_scale=self.bn_affine, use_bias=self.bn_affine,
                      name="bn")(x, train=train)
        if self.activate:
            x = nn.relu(x)
        return x


class _PreResActivation(nn.Module):
    """BN(affine flag) + ReLU (reference wrn1bit_cifar.py:375)."""

    bn_affine: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(use_scale=self.bn_affine, use_bias=self.bn_affine,
                      name="bn")(x, train=train)
        return nn.relu(x)


def CIFARWRN1bit(channels, init_block_channels: int, binarized: bool = True,
                 in_channels: int = 3, in_size: Tuple[int, int] = (32, 32),
                 num_classes: int = 10) -> ImageClassifier:
    """CIFAR WRN-1bit (reference wrn1bit_cifar.py:404)."""
    layers = [Conv2d1bit(out_channels=init_block_channels, kernel_size=3,
                         padding=1, binarized=binarized, name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(PreResUnit1bit(out_channels=out_channels,
                                        stride=stride, binarized=binarized,
                                        name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(_PreResActivation(bn_affine=False, name="post_activ"))
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=WRN1bitOutput(num_classes=num_classes, binarized=binarized,
                             name="output"),
        output_before_flatten=True,
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_wrn1bit_cifar(num_classes: int, blocks: int, width_factor: int,
                      binarized: bool = True, **kwargs):
    """Config expander (reference wrn1bit_cifar.py:478)."""
    assert (blocks - 2) % 6 == 0
    layers = [(blocks - 2) // 6] * 3
    channels_per_layers = [16, 32, 64]
    init_block_channels = 16 * width_factor
    channels = [[ci * width_factor] * li
                for ci, li in zip(channels_per_layers, layers)]
    return CIFARWRN1bit(channels=channels,
                        init_block_channels=init_block_channels,
                        binarized=binarized, num_classes=num_classes,
                        **kwargs)


for _bits, _bin in [("1bit", True), ("32bit", False)]:
    for _ds, _classes in [("cifar10", 10), ("cifar100", 100), ("svhn", 10)]:
        _name = f"wrn20_10_{_bits}_{_ds}"

        def _make(binarized=_bin, classes=_classes):
            def ctor(num_classes: int = classes, **kwargs):
                return get_wrn1bit_cifar(num_classes=num_classes, blocks=20,
                                         width_factor=10,
                                         binarized=binarized, **kwargs)
            return ctor
        _ctor = _make()
        _ctor.__name__ = _name
        register_model(_name)(_ctor)
