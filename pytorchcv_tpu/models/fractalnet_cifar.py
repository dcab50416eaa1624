"""FractalNet for CIFAR, TPU-native. Behavioral reference: pytorchcv
``models/fractalnet_cifar.py`` (DropConvBlock:14, FractalBlock:90,
FractalUnit:250, CIFARFractalNet:291, get_fractalnet_cifar:380).

Drop-path: eval joins columns by mean; train applies the reference's
global/local column drop masks, sampled with JAX PRNG instead of numpy."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import BatchNorm, Sequential, max_pool2d
from ..nn.base import conv_kernel_init, dense_kernel_init
from .registry import register_model
from .shell import ImageClassifier

__all__ = ["CIFARFractalNet", "get_fractalnet_cifar"]


class DropConvBlock(nn.Module):
    """conv + BN + ReLU + dropout2d (reference fractalnet_cifar.py:14)."""

    out_channels: int = 0
    dropout_prob: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, kernel_init=conv_kernel_init,
                    name="conv")(x)
        x = BatchNorm(name="bn")(x, train=train)
        x = nn.relu(x)
        if self.dropout_prob != 0.0:
            # torch Dropout2d: drop whole channels
            x = nn.Dropout(rate=self.dropout_prob, deterministic=not train,
                           broadcast_dims=(1, 2))(x)
        return x


def _join_outs(raw_outs, glob_num_columns, num_columns, loc_drop_prob,
               train, rng):
    """Column join with drop-path masks (reference
    fractalnet_cifar.py:143-219)."""
    curr = len(raw_outs)
    out = jnp.stack(raw_outs, axis=0)  # (C, B, H, W, ch)
    if not train:
        return out.mean(axis=0)
    batch_size = out.shape[1]
    glob_batch_size = glob_num_columns.shape[0]
    # global part: one designated column per sample (or none if out of range)
    glob_drop_num = glob_num_columns - (num_columns - curr)
    cols = jnp.arange(curr)[:, None]
    glob_mask = ((cols == glob_drop_num[None, :]) &
                 (glob_drop_num[None, :] >= 0)).astype(out.dtype)
    # local part: iid bernoulli keep, with dead samples revived on a random
    # column
    k1, k2 = jax.random.split(rng)
    loc_batch = batch_size - glob_batch_size
    loc_mask = jax.random.bernoulli(
        k1, 1.0 - loc_drop_prob, (curr, loc_batch)).astype(out.dtype)
    alive = loc_mask.sum(axis=0)
    revive_col = jax.random.randint(k2, (loc_batch,), 0, curr)
    revive = (jnp.arange(curr)[:, None] == revive_col[None, :]).astype(
        out.dtype)
    loc_mask = jnp.where(alive[None, :] == 0.0, revive, loc_mask)
    mask = jnp.concatenate([glob_mask, loc_mask], axis=1)
    mask = mask[:, :, None, None, None]
    masked = out * mask
    num_alive = mask.sum(axis=0)
    num_alive = jnp.where(num_alive == 0.0, 1.0, num_alive)
    return masked.sum(axis=0) / num_alive


class FractalLevelBlock(nn.Module):
    """One fractal level: the active columns' sub-blocks (torch
    ``blocks.block{i}``, reference fractalnet_cifar.py:112-123)."""

    out_channels: int = 0
    dropout_prob: float = 0.0
    active_columns: Tuple = ()

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        outs = []
        for j, x in zip(self.active_columns, inputs):
            outs.append(DropConvBlock(
                out_channels=self.out_channels,
                dropout_prob=self.dropout_prob,
                name=f"subblock{j + 1}")(x, train=train))
        return outs


class FractalLevels(nn.Module):
    """The level stack + join loop (torch ``blocks`` Sequential plus the
    FractalBlock.forward traversal, reference fractalnet_cifar.py:221-240)."""

    out_channels: int = 0
    num_columns: int = 3
    loc_drop_prob: float = 0.15
    dropout_prob: float = 0.0

    @nn.compact
    def __call__(self, x, glob_num_columns=None, train: bool = False):
        depth = 2 ** (self.num_columns - 1)
        outs = [x] * self.num_columns
        for i in range(depth):
            js = [j for j in range(self.num_columns)
                  if (i + 1) % (2 ** j) == 0]
            outs_i = FractalLevelBlock(
                out_channels=self.out_channels,
                dropout_prob=self.dropout_prob,
                active_columns=tuple(js),
                name=f"block{i + 1}")([outs[j] for j in js], train=train)
            rng = self.make_rng("dropout") if train else None
            joined = _join_outs(outs_i[::-1], glob_num_columns,
                                self.num_columns, self.loc_drop_prob,
                                train, rng)
            for j in js:
                outs[j] = joined
        return outs[0]


class FractalBlock(nn.Module):
    """Fractal expansion block (reference fractalnet_cifar.py:90)."""

    out_channels: int = 0
    num_columns: int = 3
    loc_drop_prob: float = 0.15
    dropout_prob: float = 0.0

    @nn.compact
    def __call__(self, x, glob_num_columns=None, train: bool = False):
        return FractalLevels(out_channels=self.out_channels,
                             num_columns=self.num_columns,
                             loc_drop_prob=self.loc_drop_prob,
                             dropout_prob=self.dropout_prob,
                             name="blocks")(x, glob_num_columns, train=train)


class FractalUnit(nn.Module):
    """Fractal block + 2x2 max pool (reference fractalnet_cifar.py:250)."""

    out_channels: int = 0
    num_columns: int = 3
    loc_drop_prob: float = 0.15
    dropout_prob: float = 0.0

    @nn.compact
    def __call__(self, x, glob_num_columns=None, train: bool = False):
        x = FractalBlock(out_channels=self.out_channels,
                         num_columns=self.num_columns,
                         loc_drop_prob=self.loc_drop_prob,
                         dropout_prob=self.dropout_prob,
                         name="block")(x, glob_num_columns, train=train)
        return max_pool2d(2, 2)(x)


class FractalFeatures(nn.Module):
    """Unit stack threading the global column selection."""

    channels: Tuple = ()
    num_columns: int = 3
    dropout_probs: Tuple = ()
    loc_drop_prob: float = 0.15
    glob_drop_ratio: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        glob_batch_size = int(x.shape[0] * self.glob_drop_ratio)
        if train:
            rng = self.make_rng("dropout")
            glob_num_columns = jax.random.randint(
                rng, (glob_batch_size,), 0, self.num_columns)
        else:
            glob_num_columns = jnp.zeros((glob_batch_size,), jnp.int32)
        for i, out_channels in enumerate(self.channels):
            x = FractalUnit(out_channels=out_channels,
                            num_columns=self.num_columns,
                            loc_drop_prob=self.loc_drop_prob,
                            dropout_prob=self.dropout_probs[i],
                            name=f"unit{i + 1}")(x, glob_num_columns,
                                                 train=train)
        return x


def CIFARFractalNet(channels, num_columns: int, dropout_probs,
                    loc_drop_prob: float, glob_drop_ratio: float,
                    in_channels: int = 3, in_size: Tuple[int, int] = (32, 32),
                    num_classes: int = 10) -> ImageClassifier:
    """CIFAR FractalNet (reference fractalnet_cifar.py:291)."""
    return ImageClassifier(
        features=FractalFeatures(
            channels=tuple(channels), num_columns=num_columns,
            dropout_probs=tuple(dropout_probs),
            loc_drop_prob=loc_drop_prob, glob_drop_ratio=glob_drop_ratio,
            name="features"),
        output=nn.Dense(num_classes, kernel_init=dense_kernel_init,
                        name="output"),
        in_size=in_size, in_channels=in_channels, num_classes=num_classes)


def get_fractalnet_cifar(num_classes: int, **kwargs):
    """Config expander (reference fractalnet_cifar.py:380)."""
    dropout_probs = (0.0, 0.1, 0.2, 0.3, 0.4)
    channels = [64 * (2 ** (i if i != len(dropout_probs) - 1 else i - 1))
                for i in range(len(dropout_probs))]
    return CIFARFractalNet(channels=channels, num_columns=3,
                           dropout_probs=dropout_probs, loc_drop_prob=0.15,
                           glob_drop_ratio=0.5, num_classes=num_classes,
                           **kwargs)


for _ds, _classes in [("cifar10", 10), ("cifar100", 100)]:
    _name = f"fractalnet_{_ds}"

    def _make(classes=_classes):
        def ctor(num_classes: int = classes, **kwargs):
            return get_fractalnet_cifar(num_classes=num_classes, **kwargs)
        return ctor
    _ctor = _make()
    _ctor.__name__ = _name
    register_model(_name)(_ctor)
