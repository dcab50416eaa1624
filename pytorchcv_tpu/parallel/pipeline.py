"""Pipeline parallelism (GPipe schedule) over a mesh axis.

The reference ships no parallelism at all (SURVEY.md §2.5); this is the
TPU-native pipeline story for *uniform layer stacks* — stages whose
input/output signatures match, so stage parameters can be stacked along
a leading axis and sharded one-stage-per-device. The zoo's canonical
case is ProPainter's depth-8 temporal transformer
(reference ``propainter.py:649``: eight identical
``TemporalSparseTransformerBlock`` layers); Jasper's repeated units and
RAFT's GRU trunk fit the same shape. Heterogeneous CV backbones (whose
stage shapes halve H and double C) are instead served by data / tensor /
spatial partitioning (``inference.py``, ``train.py``).

Schedule: classic GPipe. With S stages on S devices and M microbatches,
run T = M + S - 1 steps; at step t device 0 injects microbatch
``min(t, M-1)``, every device applies its own stage, activations rotate
forward one device via ``lax.ppermute`` (a pure ICI neighbor hop), and
the last device banks microbatch ``t - (S-1)`` once it is finished.
Bubble-slot computation is masked garbage that is never written out, so
the result is bitwise-equal to applying the stages sequentially.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["stack_stages", "microbatch", "unmicrobatch", "pipeline_apply"]


def stack_stages(stage_trees):
    """Stack a list of identically-structured pytrees along a new leading
    axis — the stage axis that ``pipeline_apply`` shards over the mesh."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *stage_trees)


def microbatch(tree, num_microbatches: int):
    """Split every leaf's leading (batch) axis into
    ``[num_microbatches, batch // num_microbatches, ...]``."""

    def split(x):
        b = x.shape[0]
        assert b % num_microbatches == 0, (
            f"batch {b} not divisible by {num_microbatches} microbatches")
        return x.reshape((num_microbatches, b // num_microbatches)
                         + x.shape[1:])

    return jax.tree_util.tree_map(split, tree)


def unmicrobatch(tree):
    """Inverse of :func:`microbatch`: merge the leading two axes."""
    return jax.tree_util.tree_map(
        lambda x: x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:]), tree)


def pipeline_apply(stage_fn: Callable[[Any, Any], Any], stage_params: Any,
                   xs: Any, mesh: Mesh, axis: str = "pipe"):
    """Run ``xs`` through ``S = mesh.shape[axis]`` stages pipelined over
    ``axis``.

    Parameters
    ----------
    stage_fn : ``(params_i, x) -> y``
        One stage. ``x`` and ``y`` must be pytrees of identical
        structure/shapes/dtypes (pass-through leaves, e.g. an attention
        mask every stage reads, simply flow unchanged).
    stage_params : pytree
        Per-stage parameters stacked along a leading axis of size S
        (see :func:`stack_stages`). Sharded one stage per device; this is
        what makes the model *fit* — each device holds 1/S of the stack.
    xs : pytree
        Microbatched inputs, every leaf ``[M, ...]`` (see
        :func:`microbatch`). Replicated across the pipeline for
        simplicity — at test scale and for activation-dominated stacks
        the stage parameters, not the inputs, are the memory that
        matters.
    Returns the pytree of outputs, leaves ``[M, ...]``, bitwise-equal to
    the sequential ``for i in range(S): x = stage_fn(params[i], x)``.
    """
    num_stages = mesh.shape[axis]
    leaves = jax.tree_util.tree_leaves(xs)
    assert leaves, "xs must contain at least one array"
    num_micro = leaves[0].shape[0]
    perm = [(i, (i + 1) % num_stages) for i in range(num_stages)]

    def per_device(params_local, xs_local):
        idx = jax.lax.axis_index(axis)
        my_params = jax.tree_util.tree_map(lambda p: p[0], params_local)

        def take(tree, i):
            return jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(
                    x, i, 0, keepdims=False), tree)

        # The loop carry becomes device-varying (axis_index masking), so
        # the replicated zero initials must be pcast to varying upfront.
        varying = lambda v: jax.lax.pcast(v, (axis,), to="varying")
        state = jax.tree_util.tree_map(
            varying, take(jax.tree_util.tree_map(jnp.zeros_like, xs_local),
                          0))
        outs = jax.tree_util.tree_map(
            lambda x: varying(jnp.zeros_like(x)), xs_local)

        def body(t, carry):
            state, outs = carry
            inject = take(xs_local, jnp.minimum(t, num_micro - 1))
            cur = jax.tree_util.tree_map(
                lambda a, b: jnp.where(idx == 0, a, b), inject, state)
            y = stage_fn(my_params, cur)
            # Last device banks finished microbatch m = t - (S-1).
            m = t - (num_stages - 1)
            mi = jnp.clip(m, 0, num_micro - 1)
            write = jnp.logical_and(idx == num_stages - 1, m >= 0)
            outs = jax.tree_util.tree_map(
                lambda o, yy: jax.lax.dynamic_update_index_in_dim(
                    o, jnp.where(write, yy,
                                 jax.lax.dynamic_index_in_dim(
                                     o, mi, 0, keepdims=False)),
                    mi, 0), outs, y)
            state = jax.tree_util.tree_map(
                lambda v: jax.lax.ppermute(v, axis, perm), y)
            return state, outs

        _, outs = jax.lax.fori_loop(
            0, num_micro + num_stages - 1, body, (state, outs))
        # Outputs live on the last device; replicate via a masked psum so
        # the caller sees an ordinary replicated array.
        return jax.tree_util.tree_map(
            lambda o: jax.lax.psum(
                jnp.where(idx == num_stages - 1, o, jnp.zeros_like(o)),
                axis), outs)

    stage_specs = jax.tree_util.tree_map(lambda _: P(axis), stage_params)
    repl_specs = jax.tree_util.tree_map(lambda _: P(), xs)
    fn = jax.shard_map(per_device, mesh=mesh,
                       in_specs=(stage_specs, repl_specs),
                       out_specs=repl_specs)
    return fn(stage_params, xs)
