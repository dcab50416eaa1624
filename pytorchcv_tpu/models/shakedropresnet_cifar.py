"""ShakeDrop-ResNet for CIFAR/SVHN, TPU-native. Behavioral reference:
pytorchcv ``models/shakedropresnet_cifar.py`` (ShakeDrop:15,
ShakeDropResUnit:42, CIFARShakeDropResNet:100, get_shakedropresnet_cifar:170).

``shake_drop`` is a ``jax.custom_vjp`` with independent forward (alpha) and
backward (beta) stochastic scalings gated by a bernoulli ``b``."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import Sequential, conv1x1_block, conv3x3_block, global_avg_pool2d
from ..nn.base import dense_kernel_init
from .registry import register_model
from .resnet import ResBlock, ResBottleneck
from .shell import ImageClassifier

__all__ = ["CIFARShakeDropResNet", "get_shakedropresnet_cifar", "shake_drop"]


@jax.custom_vjp
def shake_drop(x, b, alpha, beta):
    """Forward (b + alpha - b*alpha) * x; backward (b + beta - b*beta) * dy
    (reference shakedropresnet_cifar.py:15-30; beta pre-sampled)."""
    del beta
    return (b + alpha - b * alpha) * x


def _sd_fwd(x, b, alpha, beta):
    return shake_drop(x, b, alpha, beta), (b, beta)


def _sd_bwd(res, dy):
    b, beta = res
    return (b + beta - b * beta) * dy, None, None, None


shake_drop.defvjp(_sd_fwd, _sd_bwd)


class ShakeDropResUnit(nn.Module):
    """ShakeDrop residual unit (reference shakedropresnet_cifar.py:42)."""

    out_channels: int = 0
    stride: int = 1
    bottleneck: bool = False
    life_prob: float = 1.0

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
        body_class = ResBottleneck if self.bottleneck else ResBlock
        x = body_class(out_channels=self.out_channels, stride=self.stride,
                       name="body")(x, train=train)
        if train:
            rng = self.make_rng("dropout")
            k1, k2, k3 = jax.random.split(rng, 3)
            b = jax.random.bernoulli(
                k1, self.life_prob, (1,)).astype(x.dtype)
            alpha = jax.random.uniform(k2, (x.shape[0], 1, 1, 1), x.dtype,
                                       minval=-1.0, maxval=1.0)
            beta = jax.random.uniform(k3, (x.shape[0], 1, 1, 1), x.dtype)
            x = shake_drop(x, b, alpha, beta)
        else:
            x = self.life_prob * x
        return nn.relu(x + identity)


def CIFARShakeDropResNet(channels, init_block_channels: int,
                         bottleneck: bool, life_probs,
                         in_channels: int = 3,
                         in_size: Tuple[int, int] = (32, 32),
                         num_classes: int = 10) -> ImageClassifier:
    """CIFAR ShakeDrop-ResNet (reference shakedropresnet_cifar.py:100)."""
    layers = [conv3x3_block(out_channels=init_block_channels,
                            name="init_block")]
    k = 0
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and (i != 0) else 1
            units.append(ShakeDropResUnit(
                out_channels=out_channels, stride=stride,
                bottleneck=bottleneck, life_prob=life_probs[k],
                name=f"unit{j + 1}"))
            k += 1
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}"))
    layers.append(global_avg_pool2d())
    return ImageClassifier(
        features=Sequential(layers=tuple(layers), name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_shakedropresnet_cifar(num_classes: int, blocks: int,
                              bottleneck: bool, **kwargs):
    """Config expander (reference shakedropresnet_cifar.py:170)."""
    assert num_classes in (10, 100)
    if bottleneck:
        assert (blocks - 2) % 9 == 0
        layers = [(blocks - 2) // 9] * 3
    else:
        assert (blocks - 2) % 6 == 0
        layers = [(blocks - 2) // 6] * 3
    channels_per_layers = [16, 32, 64]
    init_block_channels = 16
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    if bottleneck:
        channels = [[cij * 4 for cij in ci] for ci in channels]
    total_layers = sum(layers)
    final_death_prob = 0.5
    life_probs = [1.0 - float(i + 1) / float(total_layers) * final_death_prob
                  for i in range(total_layers)]
    return CIFARShakeDropResNet(channels=channels,
                                init_block_channels=init_block_channels,
                                bottleneck=bottleneck,
                                life_probs=life_probs,
                                num_classes=num_classes, **kwargs)


for _ds, _classes in [("cifar10", 10), ("cifar100", 100), ("svhn", 10)]:
    _name = f"shakedropresnet20_{_ds}"

    def _make(classes=_classes):
        def ctor(num_classes: int = classes, **kwargs):
            return get_shakedropresnet_cifar(num_classes=num_classes,
                                             blocks=20, bottleneck=False,
                                             **kwargs)
        return ctor
    _ctor = _make()
    _ctor.__name__ = _name
    register_model(_name)(_ctor)
