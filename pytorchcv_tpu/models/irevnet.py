"""i-RevNet for ImageNet-1K, TPU-native (JAX/flax, NHWC).

Behavioral reference: pytorchcv ``models/irevnet.py``
(IRevDualPathSequential:16, IRevDownscale:64, IRevInjectivePad:141,
IRevSplitBlock:170, IRevMergeBlock:196, IRevBottleneck:222, IRevUnit:281,
IRevPostActivation:357, IRevNet:381, get_irevnet:475) from 'i-RevNet: Deep
Invertible Networks' https://arxiv.org/abs/1802.07088.

The psi downscale is a pure reshape/transpose (space-to-depth with
(h_sub, w_sub, c) channel order — layout-only under XLA); the whole
feature pyramid is bijective, and :meth:`IRevNet.inverse` reconstructs the
input from the bijective output (``apply(..., method="inverse")``)."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import (BatchNorm, DualPathSequential, avg_pool2d, conv3x3,
                  pre_conv3x3_block)
from ..nn.base import IntPair, dense_kernel_init
from .registry import register_model

__all__ = ["IRevNet", "IRevDownscale", "IRevSplitBlock", "IRevMergeBlock",
           "get_irevnet"]


def irev_downscale(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """psi: (B, H, W, C) -> (B, H/s, W/s, s*s*C), channel order
    (h_sub, w_sub, c) (reference IRevDownscale.forward:77)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // scale, scale, w // scale, scale, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // scale, w // scale, scale * scale * c)


def irev_upscale(y: jnp.ndarray, scale: int) -> jnp.ndarray:
    """psi^-1 (reference IRevDownscale.inverse:98)."""
    b, h, w, c = y.shape
    xc = c // (scale * scale)
    y = y.reshape(b, h, w, scale, scale, xc)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, h * scale, w * scale, xc)


class IRevDownscale(nn.Module):
    """psi block as a module (reference irevnet.py:64)."""

    scale: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        return irev_downscale(x, self.scale)

    def inverse(self, y):
        return irev_upscale(y, self.scale)


class IRevSplitBlock(nn.Module):
    """Channel split (reference irevnet.py:170)."""

    @nn.compact
    def __call__(self, x, _=None, train: bool = False):
        x1, x2 = jnp.split(x, 2, axis=-1)
        return x1, x2


class IRevMergeBlock(nn.Module):
    """Channel merge, returns (merged, merged) (reference
    irevnet.py:196)."""

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        x = jnp.concatenate([x1, x2], axis=-1)
        return x, x


class IRevBottleneck(nn.Module):
    """Three 3x3 convs, first optionally non-preactivated (reference
    irevnet.py:222)."""

    out_channels: int = 0
    stride: IntPair = 1
    preactivate: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_channels = self.out_channels // 4
        if self.preactivate:
            x = pre_conv3x3_block(out_channels=mid_channels,
                                  stride=self.stride, name="conv1")(
                                      x, train=train)
        else:
            x = conv3x3(out_channels=mid_channels, stride=self.stride,
                        name="conv1")(x)
        x = pre_conv3x3_block(out_channels=mid_channels, name="conv2")(
            x, train=train)
        return pre_conv3x3_block(out_channels=self.out_channels,
                                 name="conv3")(x, train=train)


class IRevUnit(nn.Module):
    """Invertible coupling unit (reference irevnet.py:281)."""

    out_channels: int = 0
    stride: IntPair = 1
    preactivate: bool = True

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        in_channels = x2.shape[-1]
        padding = 2 * (self.out_channels - in_channels)
        do_padding = (padding != 0) and (self.stride == 1)
        do_downscale = self.stride != 1
        if do_padding:
            x = jnp.concatenate([x1, x2], axis=-1)
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, padding)))
            x1, x2 = jnp.split(x, 2, axis=-1)
        fx2 = IRevBottleneck(out_channels=self.out_channels,
                             stride=self.stride,
                             preactivate=self.preactivate,
                             name="bottleneck")(x2, train=train)
        if do_downscale:
            x1 = irev_downscale(x1, self.stride)
            x2 = irev_downscale(x2, self.stride)
        return x2, fx2 + x1


class IRevPostActivation(nn.Module):
    """Final BN(momentum 0.9)+ReLU (reference irevnet.py:357)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch momentum=0.9 => flax momentum 0.1
        return nn.relu(BatchNorm(momentum=0.1, name="bn")(x, train=train))


class IRevNet(nn.Module):
    """i-RevNet (reference irevnet.py:381). ``__call__`` returns logits (or
    (logits, out_bij) with ``return_out_bij``); :meth:`inverse` maps the
    bijective feature back to the input pixels."""

    channels: Any = ()
    init_block_channels: int = 12
    final_block_channels: int = 3072
    return_out_bij: bool = False
    in_channels: int = 3
    in_size: Tuple[int, int] = (224, 224)
    num_classes: int = 1000

    def _features(self):
        layers = [IRevDownscale(scale=2, name="init_block", parent=None),
                  IRevSplitBlock(name="init_split", parent=None)]
        for i, channels_per_stage in enumerate(self.channels):
            units = []
            for j, out_channels in enumerate(channels_per_stage):
                units.append(IRevUnit(
                    out_channels=out_channels,
                    stride=(2 if j == 0 else 1),
                    preactivate=not ((i == 0) and (j == 0)),
                    name=f"unit{j + 1}", parent=None))
            units_seq = DualPathSequential(layers=tuple(units),
                                           name=f"stage{i + 1}",
                                           parent=None)
            layers.append(units_seq)
        layers.append(IRevMergeBlock(name="final_merge", parent=None))
        layers.append(IRevPostActivation(name="final_postactiv",
                                         parent=None))
        layers.append(avg_pool2d(kernel_size=7, stride=1))
        return DualPathSequential(layers=tuple(layers), return_two=True,
                                  first_ordinals=1, last_ordinals=2,
                                  name="features")

    @nn.compact
    def __call__(self, x, train: bool = False):
        x, out_bij = self._features()(x, train=train)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.num_classes, kernel_init=dense_kernel_init,
                     name="output")(x)
        if self.return_out_bij:
            return x, out_bij
        return x

def irevnet_inverse(module: "IRevNet", variables, out_bij,
                    train: bool = False):
    """Reconstruct input pixels from the bijective output (reference
    IRevNet.inverse:468 / IRevUnit.inverse:337 — the reference walks
    modules in reverse, skipping the two non-invertible tail layers).

    Functional: reuses the FORWARD parameters by applying each unit's
    bottleneck on its variable subtree, so no duplicate scopes exist."""
    params = variables["params"]["features"]
    stats = variables.get("batch_stats", {}).get("features", {})

    # final_merge inverse: chunk
    x2, y1 = jnp.split(out_bij, 2, axis=-1)
    for i in reversed(range(len(module.channels))):
        stage = f"stage{i + 1}"
        for j in reversed(range(len(module.channels[i]))):
            unit = f"unit{j + 1}"
            out_channels = module.channels[i][j]
            stride = 2 if j == 0 else 1
            preactivate = not ((i == 0) and (j == 0))
            bott = IRevBottleneck(out_channels=out_channels, stride=stride,
                                  preactivate=preactivate)
            sub = {"params": params[stage][unit]["bottleneck"]}
            if stage in stats and unit in stats.get(stage, {}):
                sub["batch_stats"] = stats[stage][unit]["bottleneck"]
            if stride != 1:
                x2 = irev_upscale(x2, stride)
            fx2 = bott.apply(sub, x2, train=train)
            x1 = y1 - fx2
            if stride != 1:
                x1 = irev_upscale(x1, stride)
            # undo injective channel pad (stride-1 units that widened)
            prev_channels = (module.channels[i][j - 1] if j > 0 else
                             (module.channels[i - 1][-1] if i > 0 else
                              module.init_block_channels // 2))
            pad = 2 * (out_channels - prev_channels) if stride == 1 else 0
            if pad != 0:
                x = jnp.concatenate([x1, x2], axis=-1)
                x = x[..., :x.shape[-1] - pad]
                x1, x2 = jnp.split(x, 2, axis=-1)
            x2, y1 = x1, x2
    # init_split inverse: concat; init_block inverse: psi^-1
    x = jnp.concatenate([x2, y1], axis=-1)
    return irev_upscale(x, 2)


def get_irevnet(blocks: int, **kwargs) -> IRevNet:
    """Config expander (reference irevnet.py:475)."""
    if blocks != 301:
        raise ValueError(f"Unsupported i-RevNet with blocks: {blocks}")
    layers = [6, 16, 72, 6]
    channels_per_layers = [24, 96, 384, 1536]
    channels = tuple(tuple([ci] * li)
                     for ci, li in zip(channels_per_layers, layers))
    return IRevNet(channels=channels, init_block_channels=12,
                   final_block_channels=3072, **kwargs)


@register_model("irevnet301")
def irevnet301(**kwargs):
    return get_irevnet(blocks=301, **kwargs)
