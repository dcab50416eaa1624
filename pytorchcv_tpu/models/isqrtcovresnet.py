"""iSQRT-COV-ResNet for ImageNet-1K, TPU-native (JAX/flax, NHWC).

Behavioral reference: pytorchcv ``models/isqrtcovresnet.py`` (CovPool:15,
NewtonSchulzSqrt:77, Triuvec:195, iSQRTCOVPool:252, iSQRTCOVResNet:283,
get_isqrtcovresnet:372) from 'Towards Faster Training of Global Covariance
Pooling Networks by Iterative Matrix Square Root Normalization'
https://arxiv.org/abs/1712.01034.

The reference hand-writes backward passes for its three matrix functions
(covariance pool, Newton-Schulz square root, upper-triangle extraction);
those backwards are exactly the analytic gradients of the forward math,
so under JAX the ops are plain jnp expressions — batched matmuls that
land on the MXU — and autodiff reproduces the same gradients. The
Newton-Schulz recursion has a FIXED iteration count, so it is unrolled
under jit."""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from ..nn import Sequential, conv1x1_block
from ..nn.base import dense_kernel_init
from .registry import register_model
from .resnet import ResInitBlock, ResUnit
from .shell import ImageClassifier

__all__ = ["iSQRTCOVResNet", "isqrt_cov_pool", "get_isqrtcovresnet"]


def cov_pool(x: jnp.ndarray) -> jnp.ndarray:
    """Centered covariance of spatial positions (reference CovPool:15).
    ``x``: (B, H, W, C) -> (B, C, C)."""
    b, h, w, c = x.shape
    n = h * w
    xn = x.reshape(b, n, c)
    mean = jnp.mean(xn, axis=1, keepdims=True)
    xc = xn - mean
    # sigma = xn^T I_bar xn == xc^T xc / n (I_bar = (I - 11^T/n)/n)
    return jnp.einsum("bnc,bnd->bcd", xc, xc) / n


def newton_schulz_sqrt(x: jnp.ndarray, n_iter: int = 5) -> jnp.ndarray:
    """Trace-normalized Newton-Schulz matrix square root (reference
    NewtonSchulzSqrt:77). Fixed-trip recursion, unrolled under jit."""
    assert n_iter > 1
    b, m, m2 = x.shape
    assert m == m2
    identity = jnp.eye(m, dtype=x.dtype)[None]
    x_trace = jnp.trace(x, axis1=1, axis2=2)[:, None, None]
    a = x / x_trace
    i3 = 3.0 * identity
    y = a @ (0.5 * (i3 - a))
    z = 0.5 * (i3 - a)
    for _ in range(1, n_iter - 1):
        b2 = 0.5 * (i3 - z @ y)
        y = y @ b2
        z = b2 @ z
    yn = y @ (0.5 * (i3 - z @ y))
    return yn * jnp.sqrt(x_trace)


def triuvec(x: jnp.ndarray) -> jnp.ndarray:
    """Upper-triangle (incl. diagonal) flattened row-major (reference
    Triuvec:195)."""
    b, n, n2 = x.shape
    assert n == n2
    r, c = np.triu_indices(n)
    return x.reshape(b, n * n)[:, r * n + c]


def isqrt_cov_pool(x: jnp.ndarray, num_iter: int = 5) -> jnp.ndarray:
    """iSQRT-COV pooling (reference iSQRTCOVPool:252)."""
    return triuvec(newton_schulz_sqrt(cov_pool(x), num_iter))


def iSQRTCOVResNet(channels, init_block_channels: int,
                   final_block_channels: int, bottleneck: bool,
                   conv1_stride: bool, in_channels: int = 3,
                   in_size: Tuple[int, int] = (224, 224),
                   num_classes: int = 1000) -> ImageClassifier:
    """iSQRT-COV-ResNet (reference isqrtcovresnet.py:283). NB: the LAST
    stage keeps stride 1 (the covariance pool wants 14x14 features)."""
    layers = [ResInitBlock(out_channels=init_block_channels,
                           name="init_block", parent=None)]
    for i, channels_per_stage in enumerate(channels):
        units = []
        for j, out_channels in enumerate(channels_per_stage):
            stride = 2 if (j == 0) and \
                (i not in [0, len(channels) - 1]) else 1
            units.append(ResUnit(
                out_channels=out_channels, stride=stride,
                bottleneck=bottleneck, conv1_stride=conv1_stride,
                name=f"unit{j + 1}", parent=None))
        layers.append(Sequential(layers=tuple(units), name=f"stage{i + 1}",
                                 parent=None))
    layers.append(conv1x1_block(out_channels=final_block_channels,
                                name="final_block", parent=None))
    layers.append(isqrt_cov_pool)
    features = Sequential(layers=tuple(layers), name="features")
    return ImageClassifier(
        features=features,
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_isqrtcovresnet(blocks: int, conv1_stride: bool = True, **kwargs):
    """Config expander (reference isqrtcovresnet.py:372)."""
    layer_table = {18: [2, 2, 2, 2], 34: [3, 4, 6, 3], 50: [3, 4, 6, 3],
                   101: [3, 4, 23, 3], 152: [3, 8, 36, 3]}
    layers = layer_table[blocks]
    init_block_channels = 64
    final_block_channels = 256
    if blocks < 50:
        channels_per_layers = [64, 128, 256, 512]
        bottleneck = False
    else:
        channels_per_layers = [256, 512, 1024, 2048]
        bottleneck = True
    channels = [[ci] * li for ci, li in zip(channels_per_layers, layers)]
    return iSQRTCOVResNet(channels=channels,
                          init_block_channels=init_block_channels,
                          final_block_channels=final_block_channels,
                          bottleneck=bottleneck, conv1_stride=conv1_stride,
                          **kwargs)


@register_model("isqrtcovresnet18")
def isqrtcovresnet18(**kwargs):
    return get_isqrtcovresnet(blocks=18, **kwargs)


@register_model("isqrtcovresnet34")
def isqrtcovresnet34(**kwargs):
    return get_isqrtcovresnet(blocks=34, **kwargs)


@register_model("isqrtcovresnet50")
def isqrtcovresnet50(**kwargs):
    return get_isqrtcovresnet(blocks=50, **kwargs)


@register_model("isqrtcovresnet50b")
def isqrtcovresnet50b(**kwargs):
    return get_isqrtcovresnet(blocks=50, conv1_stride=False, **kwargs)


@register_model("isqrtcovresnet101")
def isqrtcovresnet101(**kwargs):
    return get_isqrtcovresnet(blocks=101, **kwargs)


@register_model("isqrtcovresnet101b")
def isqrtcovresnet101b(**kwargs):
    return get_isqrtcovresnet(blocks=101, conv1_stride=False, **kwargs)
