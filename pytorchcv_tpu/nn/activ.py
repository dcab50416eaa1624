"""Activation vocabulary (TPU-native analog of reference ``common/activ.py``).

Activations are plain ``jnp``-level functions where parameter-free, and linen
modules where they carry parameters (PReLU). Factories mirror the reference's
lambda generators (activ.py:50-185) but are tagged higher-order functions.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


__all__ = [
    "swish", "hsigmoid", "hswish", "PReLU",
    "lambda_relu", "lambda_relu6", "lambda_prelu", "lambda_leakyrelu",
    "lambda_sigmoid", "lambda_tanh", "lambda_hsigmoid", "lambda_swish",
    "lambda_hswish", "create_activation_layer",
]


def swish(x):
    """x * sigmoid(x) (reference activ.py:16)."""
    return x * jax.nn.sigmoid(x)


def hsigmoid(x):
    """relu6(x + 3) / 6 (reference activ.py:24)."""
    return jax.nn.relu6(x + 3.0) / 6.0


def hswish(x):
    """x * relu6(x + 3) / 6 (reference activ.py:33)."""
    return x * jax.nn.relu6(x + 3.0) / 6.0


class PReLU(nn.Module):
    """Parametric ReLU with a learnable negative slope.

    Matches torch nn.PReLU: ``num_parameters`` is 1 or the channel count;
    parameter name ``weight`` for checkpoint-key parity.
    """

    num_parameters: int = 1
    init_value: float = 0.25

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight",
            lambda rng, shape: jnp.full(shape, self.init_value, jnp.float32),
            (self.num_parameters,),
        )
        w = w.astype(x.dtype)
        return jnp.where(x >= 0, x, x * w)


def lambda_relu(inplace: bool = True):
    del inplace  # functional JAX has no in-place semantics
    return _named_factory(lambda name=None: jax.nn.relu)


def lambda_relu6(inplace: bool = True):
    del inplace
    return _named_factory(lambda name=None: jax.nn.relu6)


def lambda_prelu(num_parameters: int = 1):
    return _named_factory(
        lambda name="activ": PReLU(num_parameters=num_parameters, name=name))


def lambda_leakyrelu(negative_slope: float = 1e-2, inplace: bool = True):
    del inplace
    return _named_factory(
        lambda name=None: lambda x: jax.nn.leaky_relu(x, negative_slope))


def lambda_sigmoid():
    return _named_factory(lambda name=None: jax.nn.sigmoid)


def lambda_tanh():
    return _named_factory(lambda name=None: jnp.tanh)


def lambda_hsigmoid():
    return _named_factory(lambda name=None: hsigmoid)


def lambda_swish():
    return _named_factory(lambda name=None: swish)


def lambda_hswish(inplace: bool = True):
    del inplace
    return _named_factory(lambda name=None: hswish)


def _named_factory(fn):
    fn._is_factory = True
    return fn


_STR_ACTIVATIONS: dict = {
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "swish": swish,
    "hswish": hswish,
    "sigmoid": jax.nn.sigmoid,
    "hsigmoid": hsigmoid,
    "tanh": jnp.tanh,
    "gelu": jax.nn.gelu,
}


def create_activation_layer(activation, name: str = "activ"):
    """Resolve an activation spec (reference activ.py:188).

    Accepts: None | str | plain fn | tagged factory (from ``lambda_*``).
    Returns a callable ``x -> x`` (possibly a linen Module) or None.
    """
    if activation is None:
        return None
    if isinstance(activation, str):
        try:
            return _STR_ACTIVATIONS[activation]
        except KeyError:
            raise NotImplementedError(f"Unknown activation: {activation}")
    if getattr(activation, "_is_factory", False):
        return activation(name=name)
    if isinstance(activation, nn.Module) or callable(activation):
        return activation
    raise NotImplementedError(f"Unsupported activation spec: {activation!r}")
