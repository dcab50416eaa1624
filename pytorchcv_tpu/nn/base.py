"""Shared helpers for the TPU-native block vocabulary.

Design notes (vs reference ``pytorchcv/models/common/conv.py``):
  * All tensors are NHWC (TPU-native); the reference is NCHW.
  * ``padding`` follows the reference's torch conventions so that model config
    tables can be shared verbatim: int -> symmetric, (ph, pw) -> per-dim
    symmetric, (left, right, top, bottom) -> explicit asymmetric
    (reference conv.py:245-249 uses nn.ZeroPad2d for the 4-tuple case; XLA
    convs support asymmetric padding natively so no separate pad op is needed).
  * Layer factories ("lambda generators" in the reference, activ.py:50-185)
    are plain higher-order functions tagged with ``_is_factory`` so they can
    be distinguished from raw activation functions.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

IntPair = Union[int, Tuple[int, int]]
Padding2d = Union[int, Tuple[int, int], Tuple[int, int, int, int]]


def to_2tuple(v: IntPair) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        assert len(v) == 2
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def to_pad2d(padding: Padding2d) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """Torch padding spec -> XLA ((top, bottom), (left, right))."""
    if isinstance(padding, (tuple, list)):
        if len(padding) == 4:
            left, right, top, bottom = padding
            return ((int(top), int(bottom)), (int(left), int(right)))
        assert len(padding) == 2
        ph, pw = padding
        return ((int(ph), int(ph)), (int(pw), int(pw)))
    p = int(padding)
    return ((p, p), (p, p))


def to_pad1d(padding: Union[int, Tuple[int, int]]) -> Tuple[Tuple[int, int]]:
    if isinstance(padding, (tuple, list)):
        lo, hi = padding
        return ((int(lo), int(hi)),)
    p = int(padding)
    return ((p, p),)


def factory(fn: Callable) -> Callable:
    """Tag ``fn`` as a layer factory (returns a layer when called)."""
    fn._is_factory = True  # type: ignore[attr-defined]
    return fn


def is_factory(obj: Any) -> bool:
    return callable(obj) and getattr(obj, "_is_factory", False)


# torch's default conv init is kaiming_uniform; the reference additionally
# re-initializes every Conv2d with kaiming_uniform (resnet.py:326-331).
conv_kernel_init = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")
# torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(+-sqrt(3/fan_in)).
dense_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class Held:
    """Opaque holder that hides a linen Module from flax's dataclass-field
    traversal, so containers control adoption (and naming) themselves.

    Flax force-renames field-stored children to ``<field>_<i>``; we need the
    modules' explicit torch-parity names to win, so containers store children
    as ``Held`` and adopt them via ``clone(parent=self)`` at call time.
    """

    __slots__ = ("module",)

    def __init__(self, module):
        self.module = module

    def __repr__(self):
        return f"Held({self.module!r})"


def _wrap_modules(value):
    """Recursively wrap Module values (and modules inside lists/tuples)."""
    if isinstance(value, nn.Module):
        return Held(value)
    if isinstance(value, (list, tuple)):
        wrapped = [_wrap_modules(v) for v in value]
        if any(w is not v for w, v in zip(wrapped, value)):
            return tuple(wrapped)
        return value
    return value


class Composed(nn.Module):
    """Base class for modules composed of pre-built child modules.

    Subclasses receive unbound child modules (with explicit names) through
    dataclass fields; ``__post_init__`` hides them from flax, and ``adopt``
    binds a child into this module's scope under its own name at call time.
    """

    def __post_init__(self):
        import dataclasses as _dc
        for f in _dc.fields(self):
            if f.name in ("name", "parent"):
                continue
            v = getattr(self, f.name, None)
            w = _wrap_modules(v)
            if w is not v:
                object.__setattr__(self, f.name, w)
        super().__post_init__()

    def adopt(self, m, _cache=None):
        """Unwrap + bind a child module into this module's scope."""
        if isinstance(m, Held):
            m = m.module
        if isinstance(m, nn.Module) and m.scope is None:
            if _cache is not None:
                key = id(m)
                if key in _cache:
                    return _cache[key]
                bound = m.clone(parent=self)
                _cache[key] = bound
                return bound
            m = m.clone(parent=self)
        return m

    def adopt_call(self, m, x, train: bool = False, _cache=None, **kwargs):
        return call_block(self.adopt(m, _cache), x, train=train, **kwargs)


_TRAIN_KWARG_CACHE: dict = {}


def accepts_train(m: Callable) -> bool:
    key = type(m) if isinstance(m, nn.Module) else m
    hit = _TRAIN_KWARG_CACHE.get(key)
    if hit is None:
        try:
            sig = inspect.signature(m.__call__ if isinstance(m, nn.Module) else m)
            hit = "train" in sig.parameters
        except (TypeError, ValueError):
            hit = False
        _TRAIN_KWARG_CACHE[key] = hit
    return hit


def call_block(m: Callable, x, train: bool = False, **kwargs):
    """Invoke a block, passing ``train`` only to blocks that accept it."""
    if accepts_train(m):
        return m(x, train=train, **kwargs)
    return m(x, **kwargs)
