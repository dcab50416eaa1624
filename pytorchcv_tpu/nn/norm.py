"""Normalization vocabulary (TPU-native analog of reference ``common/norm.py``).

All norm layers expose ``__call__(x, train=False)`` so containers can thread
the train flag uniformly. BatchNorm keeps running statistics in the linen
``batch_stats`` collection with torch-parity names via the generic checkpoint
converter (scale<-weight, mean<-running_mean, var<-running_var).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

def _tag(fn):
    fn._is_factory = True
    return fn


__all__ = [
    "BatchNorm", "GroupNorm", "InstanceNorm", "IBN",
    "lambda_batchnorm1d", "lambda_batchnorm2d", "lambda_instancenorm2d",
    "lambda_groupnorm", "create_normalization_layer",
]


class BatchNorm(nn.BatchNorm):
    """BatchNorm over the trailing channel axis (NHWC / NWC / NC).

    torch parity: eps default 1e-5, momentum 0.1 (flax momentum = 0.9).
    """

    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5

    def __call__(self, x, train: bool = False):  # type: ignore[override]
        return super().__call__(x, use_running_average=not train)


class GroupNorm(nn.GroupNorm):
    def __call__(self, x, train: bool = False):  # type: ignore[override]
        del train
        return super().__call__(x)


class InstanceNorm(nn.Module):
    """InstanceNorm2d (NHWC): normalize over H, W per sample and channel.

    torch parity: affine=False by default in torch InstanceNorm2d, but the
    reference always constructs it via factories with affine defaulting to
    torch semantics; we expose ``affine`` explicitly.
    """

    epsilon: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
            bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
            y = y * scale + bias
        return y


class IBN(nn.Module):
    """Instance-Batch Normalization split (IBN-Net; reference norm.py:118).

    The first ``first_fraction`` of channels go through InstanceNorm (affine),
    the rest through BatchNorm; results are concatenated on the channel axis.
    """

    channels: int = 0
    first_fraction: float = 0.5
    inst_first: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        h1_channels = int(self.first_fraction * self.channels)
        x1 = x[..., :h1_channels]
        x2 = x[..., h1_channels:]
        if self.inst_first:
            x1 = InstanceNorm(affine=True, name="inst_norm")(x1)
            x2 = BatchNorm(name="batch_norm")(x2, train=train)
        else:
            x1 = BatchNorm(name="batch_norm")(x1, train=train)
            x2 = InstanceNorm(affine=True, name="inst_norm")(x2)
        return jnp.concatenate([x1, x2], axis=-1)


def lambda_batchnorm1d(eps: float = 1e-5):
    return _tag(lambda name="bn", **kw: BatchNorm(epsilon=eps, name=name))


def lambda_batchnorm2d(eps: float = 1e-5):
    return _tag(lambda name="bn", **kw: BatchNorm(epsilon=eps, name=name))


def lambda_instancenorm2d(eps: float = 1e-5, affine: bool = False):
    return _tag(lambda name="bn", **kw: InstanceNorm(epsilon=eps, affine=affine, name=name))


def lambda_groupnorm(num_groups: int = 32, eps: float = 1e-5):
    return _tag(lambda name="bn", **kw: GroupNorm(num_groups=num_groups, epsilon=eps, name=name))


def create_normalization_layer(normalization, name: str = "bn", **kwargs):
    """Resolve a normalization spec (reference norm.py:95).

    Accepts None | tagged factory | linen Module instance.
    """
    if normalization is None:
        return None
    if getattr(normalization, "_is_factory", False):
        return normalization(name=name, **kwargs)
    if isinstance(normalization, nn.Module):
        return normalization
    if callable(normalization):
        return normalization(name=name, **kwargs)
    raise NotImplementedError(f"Unsupported normalization spec: {normalization!r}")
