"""Sharded batched inference.

Two partitionings (SURVEY.md §2.5 TPU plan):
  * data parallel — batch axis over the ``data`` mesh axis (the throughput
    path for the classification zoo's ``test_batch`` protocol);
  * spatial — image H axis over the mesh for huge segmentation inputs
    (480x480..2048x1024); XLA inserts the conv halo exchanges automatically.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["shard_batch", "data_parallel_infer_fn", "spatial_infer_fn"]


def shard_batch(mesh: Mesh, x, axis: str = "data"):
    """Place a host array with the batch dimension sharded over ``axis``."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def data_parallel_infer_fn(model, mesh: Mesh,
                           donate_input: bool = True) -> Callable:
    """jit a forward pass with batch sharded over ``data`` and replicated
    params. Returns ``fn(variables, x) -> logits`` (logits batch-sharded)."""
    batch_spec = P("data")
    fn = jax.jit(
        lambda v, x: model.module.apply(v, x, train=False),
        in_shardings=(None, NamedSharding(mesh, batch_spec)),
        out_shardings=NamedSharding(mesh, batch_spec),
        donate_argnums=(1,) if donate_input else (),
    )
    return fn


def spatial_infer_fn(model, mesh: Mesh, axis: str = "data") -> Callable:
    """jit a forward pass with the image H axis sharded over the mesh —
    spatial partitioning for single large inputs; XLA handles conv halos."""
    spec = NamedSharding(mesh, P(None, axis, None, None))
    # Params enter replicated: a caller may hand us a TP/FSDP-sharded
    # state, and resharding via an explicit device_put (an all-gather on
    # the sharded leaves) is both faster and quieter than leaving GSPMD to
    # discover the mismatch mid-graph (involuntary full rematerialization
    # warnings, observed on the TP-state -> spatial handoff).
    repl = NamedSharding(mesh, P())
    fn = jax.jit(
        lambda v, x: model.module.apply(v, x, train=False),
        in_shardings=(repl, spec),
    )

    def infer(variables, x):
        variables = jax.tree_util.tree_map(
            lambda a: a if getattr(a, "sharding", None) == repl
            else jax.device_put(a, repl), variables)
        return fn(variables, x)

    return infer
