"""Shake-Shake-ResNet for CIFAR/SVHN, TPU-native. Behavioral reference:
pytorchcv ``models/shakeshakeresnet_cifar.py`` (ShakeShake:17,
ShakeShakeShortcut:37, ShakeShakeResUnit:86, CIFARShakeShakeResNet:146,
get_shakeshakeresnet_cifar:205).

``shake_shake`` is a ``jax.custom_vjp``: forward mixes branches by alpha;
backward remixes gradients by an independent beta (the SURVEY §2.3
custom-autograd trio member)."""

from __future__ import annotations

from functools import reduce
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import BatchNorm, Sequential, avg_pool2d, conv1x1, conv3x3_block, \
    global_avg_pool2d
from ..nn.base import dense_kernel_init
from .registry import register_model
from .resnet import ResBlock, ResBottleneck
from .shell import ImageClassifier

__all__ = ["CIFARShakeShakeResNet", "get_shakeshakeresnet_cifar",
           "shake_shake"]


@jax.custom_vjp
def shake_shake(x1, x2, alpha, beta):
    """Forward: alpha-mix; backward: beta-mix (reference
    shakeshakeresnet_cifar.py:17-31). ``beta`` is pre-sampled (JAX backward
    passes are pure, so the reference's in-backward rand() moves here)."""
    del beta
    return alpha * x1 + (1 - alpha) * x2


def _shake_fwd(x1, x2, alpha, beta):
    return shake_shake(x1, x2, alpha, beta), beta


def _shake_bwd(beta, dy):
    return beta * dy, (1 - beta) * dy, None, None


shake_shake.defvjp(_shake_fwd, _shake_bwd)


class ShakeShakeShortcut(nn.Module):
    """Two half-width shifted-pool branches (reference
    shakeshakeresnet_cifar.py:37)."""

    out_channels: int = 0
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = self.out_channels // 2
        pool = avg_pool2d(1, self.stride)
        x1 = pool(x)
        x1 = conv1x1(out_channels=mid_channels, name="conv1")(x1)
        x2 = x[:, :-1, :-1, :]
        x2 = jnp.pad(x2, ((0, 0), (1, 0), (1, 0), (0, 0)))
        x2 = pool(x2)
        x2 = conv1x1(out_channels=mid_channels, name="conv2")(x2)
        x = jnp.concatenate([x1, x2], axis=-1)
        return BatchNorm(name="bn")(x, train=train)


class ShakeShakeResUnit(nn.Module):
    """Two-branch unit mixed by shake-shake (reference
    shakeshakeresnet_cifar.py:86)."""

    out_channels: int = 0
    stride: int = 1
    bottleneck: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        resize_identity = (in_channels != self.out_channels) or \
            (self.stride != 1)
        branch_class = ResBottleneck if self.bottleneck else ResBlock
        if resize_identity:
            identity = ShakeShakeShortcut(
                out_channels=self.out_channels, stride=self.stride,
                name="identity_branch")(x, train=train)
        else:
            identity = x
        x1 = branch_class(out_channels=self.out_channels, stride=self.stride,
                          name="branch1")(x, train=train)
        x2 = branch_class(out_channels=self.out_channels, stride=self.stride,
                          name="branch2")(x, train=train)
        if train:
            rng = self.make_rng("dropout")
            k1, k2 = jax.random.split(rng)
            alpha = jax.random.uniform(k1, (x1.shape[0], 1, 1, 1), x1.dtype)
            beta = jax.random.uniform(k2, (x1.shape[0], 1, 1, 1), x1.dtype)
            x = shake_shake(x1, x2, alpha, beta)
        else:
            x = 0.5 * (x1 + x2)
        return nn.relu(x + identity)


def CIFARShakeShakeResNet(channels, init_block_channels: int,
                          bottleneck: bool, in_channels: int = 3,
                          in_size: Tuple[int, int] = (32, 32),
                          num_classes: int = 10) -> ImageClassifier:
    """CIFAR Shake-Shake-ResNet (reference shakeshakeresnet_cifar.py:146)."""
    layers = [conv3x3_block(out_channels=init_block_channels,
                            name="init_block")]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(ShakeShakeResUnit(
                out_channels=out_channels, stride=stride,
                bottleneck=bottleneck, name=f"unit{j + 1}"))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_shakeshakeresnet_cifar(num_classes: int, blocks: int,
                               bottleneck: bool,
                               first_stage_channels: int = 16, **kwargs):
    """Config expander (reference shakeshakeresnet_cifar.py:205)."""
    assert num_classes in (10, 100)
    if bottleneck:
        assert (blocks - 2) % 9 == 0
        layers = [(blocks - 2) // 9] * 3
    else:
        assert (blocks - 2) % 6 == 0
        layers = [(blocks - 2) // 6] * 3
    init_block_channels = 16
    channels_per_layers = reduce(lambda x, y: x + [x[-1] * 2], range(2),
                                 [first_stage_channels])
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    return CIFARShakeShakeResNet(channels=channels,
                                 init_block_channels=init_block_channels,
                                 bottleneck=bottleneck,
                                 num_classes=num_classes, **kwargs)


for _blocks, _fsc, _tag in [(20, 16, "20_2x16d"), (26, 32, "26_2x32d")]:
    for _ds, _classes in [("cifar10", 10), ("cifar100", 100), ("svhn", 10)]:
        _name = f"shakeshakeresnet{_tag}_{_ds}"

        def _make(blocks=_blocks, fsc=_fsc, classes=_classes):
            def ctor(num_classes: int = classes, **kwargs):
                return get_shakeshakeresnet_cifar(
                    num_classes=num_classes, blocks=blocks,
                    bottleneck=False, first_stage_channels=fsc, **kwargs)
            return ctor
        _ctor = _make()
        _ctor.__name__ = _name
        register_model(_name)(_ctor)
