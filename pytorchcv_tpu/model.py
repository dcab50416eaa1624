"""The user-facing Model handle.

``get_model(name)`` returns a :class:`Model` — an immutable bundle of
(linen module, variables) with convenience methods. The functional pieces
(``module``, ``variables``, ``apply``) stay exposed so power users can jit /
shard / transform freely; ``__call__`` is a pre-jitted inference path.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import FrozenDict


def _leaf_count(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def _is_dynamic_arg(a) -> bool:
    """True when a positional must be traced (jit pytree arg) rather than
    treated as a jit-static cache key: arrays, containers holding arrays,
    and unhashable array-free containers (lists)."""
    if hasattr(a, "shape") or isinstance(a, np.ndarray):
        return True
    if any(hasattr(leaf, "shape") or isinstance(leaf, np.ndarray)
           for leaf in jax.tree_util.tree_leaves(a)):
        return True
    try:
        hash(a)
    except TypeError:
        return True
    return False


def _plain_dict(tree):
    """FrozenDict -> plain nested dict (msgpack-serializable)."""
    if hasattr(tree, "items"):
        return {k: _plain_dict(v) for k, v in tree.items()}
    return tree


def flatten_with_paths(tree, prefix=()):
    if hasattr(tree, "items"):
        for k in tree:
            yield from flatten_with_paths(tree[k], prefix + (k,))
    else:
        yield prefix, tree


@dataclasses.dataclass
class Model:
    """A constructed zoo model: linen module + (optionally) variables."""

    name: str
    module: nn.Module
    variables: Optional[Dict[str, Any]] = None
    # Inference input policy: float32 array inputs are cast to this dtype
    # inside the jitted call (set by as_bfloat16). Without it, one f32
    # input silently promotes every downstream activation back to f32 —
    # bf16 params alone only halve weight traffic, not MXU rate.
    input_cast: Optional[Any] = None

    @property
    def in_size(self) -> Tuple[int, int]:
        return tuple(getattr(self.module, "in_size", (224, 224)))

    @property
    def in_channels(self) -> int:
        return int(getattr(self.module, "in_channels", 3))

    @property
    def num_classes(self) -> int:
        return int(getattr(self.module, "num_classes", 0))

    def dummy_input(self, batch: int = 1, dtype=jnp.float32):
        # Non-image models (e.g. ASR) declare their own example inputs.
        maker = getattr(self.module, "dummy_inputs", None)
        if maker is not None:
            return maker(batch)
        h, w = self.in_size
        return jnp.zeros((batch, h, w, self.in_channels), dtype)

    def init(self, rng: int | jax.Array = 0, batch: int = 1,
             dtype=jnp.float32) -> "Model":
        """Materialize variables (jitted so init compiles once)."""
        if isinstance(rng, int):
            rng = jax.random.PRNGKey(rng)
        x = self.dummy_input(batch, dtype)
        args = x if isinstance(x, tuple) else (x,)
        variables = jax.jit(functools.partial(self.module.init, train=False))(
            rng, *args)
        return dataclasses.replace(self, variables=variables)

    def shape_variables(self, batch: int = 1):
        """Variable *shapes* via jax.eval_shape — no FLOPs executed."""
        rng = jax.random.PRNGKey(0)
        maker = getattr(self.module, "dummy_inputs", None)
        if maker is not None:
            args = maker(batch)
            args = args if isinstance(args, tuple) else (args,)
            return jax.eval_shape(
                functools.partial(self.module.init, train=False), rng, *args)
        x = jax.ShapeDtypeStruct((batch, *self.in_size, self.in_channels),
                                 jnp.float32)
        return jax.eval_shape(
            functools.partial(self.module.init, train=False), rng, x)

    def eval_output_shape(self, batch: int = 1, variables=None):
        """Output ShapeDtypeStruct(s) via jax.eval_shape."""
        if variables is None:
            variables = self.variables or self.shape_variables(batch)
        maker = getattr(self.module, "dummy_inputs", None)
        if maker is not None:
            args = maker(batch)
            args = args if isinstance(args, tuple) else (args,)
        else:
            args = (jax.ShapeDtypeStruct(
                (batch, *self.in_size, self.in_channels), jnp.float32),)
        return jax.eval_shape(
            functools.partial(self.module.apply, train=False), variables,
            *args)

    def num_params(self) -> int:
        """Trainable parameter count (torch ``calc_net_weight_count`` parity:
        running BN stats excluded)."""
        variables = self.variables or self.shape_variables()
        return _leaf_count(variables.get("params", {}))

    def apply(self, variables, x, *extra, train: bool = False, rngs=None,
              **kwargs):
        if train:
            if rngs is None:
                rngs = {"dropout": jax.random.PRNGKey(0)}
            return self.module.apply(variables, x, *extra, train=True,
                                     mutable=["batch_stats"], rngs=rngs,
                                     **kwargs)
        return self.module.apply(variables, x, *extra, train=False, **kwargs)

    def __call__(self, x, *extra, train: bool = False, **kwargs):
        assert self.variables is not None, "call .init() first"
        if train:
            return self.apply(self.variables, x, *extra, train=True,
                              **kwargs)
        # Non-array positionals (e.g. ProPainter's local-frame count
        # ``lt``, used in static slicing) must stay out of the trace.
        # Containers holding arrays (list/tuple pytrees) and unhashable
        # values are dynamic — jit traces pytree args natively; only
        # hashable array-free values can be cache keys. Keyword args
        # (e.g. propainter_ip's ``interpolation="nearest"``) follow the
        # same split, keyed by name.
        kw_names = tuple(sorted(kwargs))
        args = (x,) + extra + tuple(kwargs[k] for k in kw_names)
        is_arr = tuple(_is_dynamic_arg(a) for a in args)
        statics = tuple(a for a, arr in zip(args, is_arr) if not arr)
        dynamic = tuple(a for a, arr in zip(args, is_arr) if arr)
        fn = self._jit_infer(is_arr, statics, kw_names)
        return fn(self.variables, *dynamic)

    @functools.cached_property
    def _infer_cache(self):
        return {}

    def _jit_infer(self, is_arr, statics, kw_names=()):
        # Variables are a jit ARGUMENT, not a closure: closed-over arrays
        # are baked into the HLO as constants, which bloats the program
        # (and overflows remote-compile payloads) for large models.
        key = (is_arr, statics, kw_names)
        fn = self._infer_cache.get(key)
        if fn is None:
            cast = self.input_cast
            n_kw = len(kw_names)

            def maybe_cast(tree):
                if cast is None:
                    return tree
                return jax.tree_util.tree_map(
                    lambda a: a.astype(cast)
                    if getattr(a, "dtype", None) == jnp.float32 else a,
                    tree)

            def reassemble(variables, *dynamic):
                it_d = iter(dynamic)
                it_s = iter(statics)
                full = [maybe_cast(next(it_d)) if arr else next(it_s)
                        for arr in is_arr]
                pos, kw_vals = (full, []) if not n_kw else \
                    (full[:-n_kw], full[-n_kw:])
                return self.module.apply(variables, *pos, train=False,
                                         **dict(zip(kw_names, kw_vals)))
            fn = jax.jit(reassemble)
            self._infer_cache[key] = fn
        return fn

    def save(self, path: str) -> str:
        """Serialize variables to a native single-file checkpoint (flax
        msgpack). The reference has no save path at all (its checkpoint
        story is download-only, model_store.py); a standalone framework
        needs round-trippable native checkpoints. For sharded multi-host
        checkpoints use orbax against ``self.variables`` directly.
        """
        assert self.variables is not None, "call .init() first"
        from flax import serialization

        data = serialization.msgpack_serialize(
            jax.tree_util.tree_map(np.asarray, _plain_dict(self.variables)))
        with open(path, "wb") as f:
            f.write(data)
        return path

    def load(self, path: str) -> "Model":
        """Load a checkpoint written by :meth:`save` (shape/dtype checked
        against this model's variable structure)."""
        from flax import serialization

        with open(path, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        target = self.variables or self.shape_variables()
        target = _plain_dict(target)
        flat_t = dict(flatten_with_paths(target))
        flat_r = dict(flatten_with_paths(raw))
        if set(flat_t) != set(flat_r):
            missing = set(flat_t) ^ set(flat_r)
            raise ValueError(f"checkpoint structure mismatch: {missing}")
        for k, leaf in flat_t.items():
            if tuple(leaf.shape) != tuple(flat_r[k].shape):
                raise ValueError(
                    f"shape mismatch at {k}: {flat_r[k].shape} vs "
                    f"{leaf.shape}")
        variables = jax.tree_util.tree_map(jnp.asarray, raw)
        return dataclasses.replace(self, variables=variables)

    def as_bfloat16(self) -> "Model":
        """Cast floating-point variables to bfloat16 (inference policy).

        BN statistics stay f32 (they only form per-channel scale/shift, but
        keeping them f32 costs nothing and preserves accuracy headroom).
        """
        assert self.variables is not None

        def cast(path, x):
            if x.dtype == jnp.float32:
                return x.astype(jnp.bfloat16)
            return x

        variables = dict(self.variables)
        has_params = bool(jax.tree_util.tree_leaves(
            variables.get("params", {})))
        if has_params:
            variables["params"] = jax.tree_util.tree_map_with_path(
                cast, variables["params"])
        # Parameterless models (propainter_ip) stay f32: they are pure
        # gather/blend programs and f32 gathers measured FASTER than bf16
        # on v5e (383 vs 309 ms for the 24-frame propagation stage).
        return dataclasses.replace(
            self, variables=variables,
            input_cast=jnp.bfloat16 if has_params else None)
