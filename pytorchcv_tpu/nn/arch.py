"""Graph containers (TPU-native analog of reference ``common/arch.py``).

Containers hold pre-built, explicitly named child modules (hidden from flax
field traversal via ``nn.base.Held``) and adopt them into their scope at call
time, so the parameter tree mirrors reference checkpoints exactly. Data flow
is plain function composition: XLA sees one flat graph and fuses across
container boundaries.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .base import Composed, call_block

__all__ = [
    "Sequential", "DualPathSequential", "Concurrent", "SequentialConcurrent",
    "ParametricSequential", "ParametricConcurrent", "MultiOutputSequential",
    "ParallelConcurent", "DualPathParallelConcurent", "Hourglass",
    "SesquialteralHourglass", "positional_layers",
]


def positional_layers(layers):
    """Rename module children to positional indices "0", "1", ...

    torch's ``del seq[-1]`` re-keys nn.Sequential children positionally, so
    reference checkpoints for composed heads (PSPNet/SimplePose backbones,
    pspnet.py:276-280) store ``backbone.0...`` keys. Cloning with numeric
    names reproduces that layout.
    """
    from .base import Held
    out = []
    for i, m in enumerate(layers):
        if isinstance(m, Held):
            m = m.module
        if isinstance(m, nn.Module):
            m = m.clone(name=str(i))
        out.append(m)
    return tuple(out)


class Sequential(Composed):
    """Ordered composition of named children (modules and/or plain callables).

    Mirrors torch nn.Sequential traversal; child linen names match reference
    checkpoints. ``Sequential.layers`` slices compose (backbone surgery).
    """

    layers: Sequence[Any] = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        cache: dict = {}
        for layer in self.layers:
            x = self.adopt_call(layer, x, train=train, _cache=cache)
        return x


class DualPathSequential(Composed):
    """Two-stream sequential (reference arch.py:14).

    The first ``first_ordinals`` and last ``last_ordinals`` children are
    ordinary single-stream blocks; the rest take and return (x1, x2).
    """

    layers: Sequence[Any] = ()
    return_two: bool = True
    first_ordinals: int = 0
    last_ordinals: int = 0

    @nn.compact
    def __call__(self, x1, x2=None, train: bool = False):
        cache: dict = {}
        length = len(self.layers)
        for i, layer in enumerate(self.layers):
            m = self.adopt(layer, cache)
            if (i < self.first_ordinals) or (i >= length - self.last_ordinals):
                x1 = call_block(m, x1, train=train)
            else:
                x1, x2 = m(x1, x2, train=train)
        if self.return_two:
            return x1, x2
        return x1


class Concurrent(Composed):
    """Parallel branches merged by concat/stack/sum (reference arch.py:58)."""

    layers: Sequence[Any] = ()
    axis: int = -1
    stack: bool = False
    merge_type: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cache: dict = {}
        merge_type = self.merge_type if self.merge_type is not None else (
            "stack" if self.stack else "cat")
        outs = [self.adopt_call(layer, x, train=train, _cache=cache)
                for layer in self.layers]
        if merge_type == "stack":
            return jnp.stack(outs, axis=1)
        if merge_type == "cat":
            return jnp.concatenate(outs, axis=self.axis)
        if merge_type == "sum":
            out = outs[0]
            for o in outs[1:]:
                out = out + o
            return out
        raise NotImplementedError(f"Unknown merge type: {merge_type}")


class SequentialConcurrent(Composed):
    """Sequential with running concatenation of child outputs
    (DenseNet-style; reference arch.py:98)."""

    layers: Sequence[Any] = ()
    axis: int = -1
    cat_input: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        cache: dict = {}
        outs = [x] if self.cat_input else []
        for layer in self.layers:
            x = self.adopt_call(layer, x, train=train, _cache=cache)
            outs.append(x)
        return jnp.concatenate(outs, axis=self.axis)


class ParametricSequential(Composed):
    """Sequential whose children receive extra kwargs (reference arch.py:133)."""

    layers: Sequence[Any] = ()

    @nn.compact
    def __call__(self, x, train: bool = False, **kwargs):
        cache: dict = {}
        for layer in self.layers:
            x = self.adopt_call(layer, x, train=train, _cache=cache, **kwargs)
        return x


class MultiOutputSequential(Composed):
    """Sequential that additionally returns outputs of flagged children
    (feature-pyramid taps; reference arch.py:309).

    ``output_idx``: indices of children whose outputs are collected.
    """

    layers: Sequence[Any] = ()
    output_idx: Sequence[int] = ()
    multi_output: bool = True
    dual_output: bool = False
    return_last: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        cache: dict = {}
        outs = []
        for i, layer in enumerate(self.layers):
            x = self.adopt_call(layer, x, train=train, _cache=cache)
            if i in tuple(self.output_idx):
                outs.append(x)
        if self.multi_output:
            return [x] + outs if self.return_last else outs
        if self.dual_output:
            return x, outs[0]
        return x


class ParallelConcurent(Composed):
    """Apply the i-th child to the i-th input; return list
    (reference arch.py:350)."""

    layers: Sequence[Any] = ()

    @nn.compact
    def __call__(self, xs, train: bool = False):
        cache: dict = {}
        return [self.adopt_call(layer, x, train=train, _cache=cache)
                for layer, x in zip(self.layers, xs)]


class ParametricConcurrent(Composed):
    """Concurrent with kwargs passed to every child, outputs concatenated
    (reference arch.py:147)."""

    layers: Sequence[Any] = ()
    axis: int = -1

    @nn.compact
    def __call__(self, x, train: bool = False, **kwargs):
        cache: dict = {}
        outs = [self.adopt_call(layer, x, train=train, _cache=cache,
                                **kwargs)
                for layer in self.layers]
        return jnp.concatenate(outs, axis=self.axis)


class DualPathParallelConcurent(Composed):
    """Per-index dual-path container: the i-th child consumes and produces
    the (x_i, y_i) pair (reference arch.py:387; torch jasper uses it to
    thread (features, lengths) through parallel branches).

    ``merge_type`` mirrors the reference ('list' | 'cat' | 'stack' |
    'sum') applied to both paths along ``axis``. NOTE: the torch default
    ``axis=1`` is the NCHW channel dim; here pass the NHWC-appropriate
    axis (usually -1) explicitly."""

    layers: Sequence[Any] = ()
    axis: int = -1
    merge_type: str = "list"

    @nn.compact
    def __call__(self, xs, ys, train: bool = False):
        from .base import accepts_train
        assert self.merge_type in ("list", "cat", "stack", "sum"), \
            self.merge_type
        cache: dict = {}
        out_x, out_y = [], []
        for layer, x, y in zip(self.layers, xs, ys):
            m = self.adopt(layer, cache)
            if accepts_train(m):
                x, y = m(x, y, train=train)
            else:
                x, y = m(x, y)
            out_x.append(x)
            out_y.append(y)
        if self.merge_type == "cat":
            return (jnp.concatenate(out_x, axis=self.axis),
                    jnp.concatenate(out_y, axis=self.axis))
        if self.merge_type == "stack":
            return (jnp.stack(out_x, axis=self.axis),
                    jnp.stack(out_y, axis=self.axis))
        if self.merge_type == "sum":
            return (jnp.stack(out_x, axis=self.axis).sum(self.axis),
                    jnp.stack(out_y, axis=self.axis).sum(self.axis))
        return out_x, out_y


class IndexedSeq(Composed):
    """A named scope holding children applied by index (the torch
    ``down_seq``/``up_seq``/``skip_seq`` Sequentials inside Hourglass)."""

    layers: Sequence[Any] = ()

    @nn.compact
    def __call__(self, x, i: int, train: bool = False, **kwargs):
        return self.adopt_call(self.layers[i], x, train=train, **kwargs)


class Hourglass(Composed):
    """Hourglass: down path, up path, skip connections (reference
    arch.py:168). Children live under ``down_seq``/``up_seq``/``skip_seq``
    scopes, mirroring the torch checkpoint layout."""

    down_seq: Sequence[Any] = ()
    up_seq: Sequence[Any] = ()
    skip_seq: Sequence[Any] = ()
    merge_type: str = "add"
    return_first_skip: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        down = IndexedSeq(layers=self.down_seq, name="down_seq")
        up = IndexedSeq(layers=self.up_seq, name="up_seq")
        skip = IndexedSeq(layers=self.skip_seq, name="skip_seq")
        depth = len(self.down_seq)
        down_outs = [x]
        for di in range(depth):
            x = down(x, di, train=train)
            down_outs.append(x)
        y = None
        for i in range(len(down_outs)):
            if i != 0:
                y = down_outs[depth - i]
                y = skip(y, depth - i, train=train)
                if (y is not None) and (self.merge_type == "cat"):
                    x = jnp.concatenate([x, y], axis=-1)
                elif y is not None:
                    x = x + y
            if i != len(down_outs) - 1:
                if i == 0 and len(self.skip_seq) > depth:
                    x = skip(x, depth, train=train)
                x = up(x, depth - 1 - i, train=train)
        if self.return_first_skip:
            return x, y
        return x


class SesquialteralHourglass(Composed):
    """1.5-pass hourglass (FishNet; reference arch.py:236)."""

    down1_seq: Sequence[Any] = ()
    skip1_seq: Sequence[Any] = ()
    up_seq: Sequence[Any] = ()
    skip2_seq: Sequence[Any] = ()
    down2_seq: Sequence[Any] = ()
    merge_type: str = "cat"

    def _merge(self, x, y):
        if y is not None:
            if self.merge_type == "cat":
                x = jnp.concatenate([x, y], axis=-1)
            elif self.merge_type == "add":
                x = x + y
        return x

    @nn.compact
    def __call__(self, x, train: bool = False):
        down1 = IndexedSeq(layers=self.down1_seq, name="down1_seq")
        skip1 = IndexedSeq(layers=self.skip1_seq, name="skip1_seq")
        up = IndexedSeq(layers=self.up_seq, name="up_seq")
        skip2 = IndexedSeq(layers=self.skip2_seq, name="skip2_seq")
        down2 = IndexedSeq(layers=self.down2_seq, name="down2_seq")
        depth = len(self.down1_seq)
        y = skip1(x, 0, train=train)
        skip1_outs = [y]
        for i in range(depth):
            x = down1(x, i, train=train)
            y = skip1(x, i + 1, train=train)
            skip1_outs.append(y)
        x = skip1_outs[depth]
        y = skip2(x, 0, train=train)
        skip2_outs = [y]
        for i in range(depth):
            x = up(x, i, train=train)
            x = self._merge(x, skip1_outs[depth - 1 - i])
            y = skip2(x, i + 1, train=train)
            skip2_outs.append(y)
        x = skip2(x, depth, train=train)
        for i in range(depth):
            x = down2(x, i, train=train)
            x = self._merge(x, skip2_outs[depth - 1 - i])
        return x
