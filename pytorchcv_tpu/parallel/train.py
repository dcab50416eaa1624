"""Sharded training step.

The reference ships no trainer (training lives in the external imgclsmob
repo, SURVEY.md §0); the TPU framework provides one natively so the zoo is
trainable at scale: data parallelism over the ``data`` mesh axis plus tensor
parallelism over ``model`` for the classifier head and wide conv kernels.

Sharding style: placement-driven — ``shard_train_state`` lays out the state
(params tensor-parallel, stats replicated, optimizer state inheriting the
params layout by propagation through a jitted init), batches are sharded
over ``data``, and the jitted step lets XLA propagate/insert ICI collectives
(the psum-on-gradients of hand-written DP emerges automatically).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["TrainState", "create_train_state", "make_train_step",
           "param_pspecs", "shard_train_state"]


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def param_pspecs(params, min_tp_features: int = 256):
    """Tensor-parallel partition specs: shard the output-feature axis of
    large kernels over ``model``; small tensors (BN vectors, biases)
    replicate."""

    def spec_for(path, x):
        leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if leaf == "kernel" and x.ndim >= 2 and \
                x.shape[-1] >= min_tp_features and x.shape[-1] % 2 == 0:
            return P(*([None] * (x.ndim - 1)), "model")
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def create_train_state(model, tx: optax.GradientTransformation) -> TrainState:
    variables = model.variables
    assert variables is not None, "model must be initialized"
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )


def shard_train_state(model, tx: optax.GradientTransformation, mesh: Mesh,
                      min_tp_features: int = 256) -> TrainState:
    """Build a TrainState laid out over ``mesh``.

    Params are device_put with tensor-parallel specs; the optimizer state is
    created *inside jit from the sharded params*, so its leaves inherit the
    params' layout without a per-leaf spec table.
    """
    variables = model.variables
    assert variables is not None, "model must be initialized"
    specs = param_pspecs(variables["params"], min_tp_features)
    params = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        variables["params"], specs)
    repl = NamedSharding(mesh, P())
    stats = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl),
        variables.get("batch_stats", {}))

    @jax.jit
    def init(params, stats):
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          batch_stats=stats, opt_state=tx.init(params))

    return init(params, stats)


def make_train_step(model, tx: optax.GradientTransformation) -> Callable:
    """jitted ``step(state, images, labels) -> (state, metrics)``.

    Shardings follow the placement of ``state`` (see ``shard_train_state``)
    and the batch (see ``inference.shard_batch``); ``state`` buffers are
    donated.
    """

    def loss_fn(params, batch_stats, images, labels, step):
        variables = {"params": params, "batch_stats": batch_stats}
        rngs = {"dropout": jax.random.fold_in(jax.random.PRNGKey(0), step)}
        logits, mutated = model.module.apply(
            variables, images, train=True, mutable=["batch_stats"],
            rngs=rngs)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()
        acc = (logits.argmax(-1) == labels).mean()
        return loss, (mutated["batch_stats"], acc)

    def step(state: TrainState, images, labels):
        (loss, (new_stats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   images, labels, state.step)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_stats, opt_state=opt_state)
        return new_state, {"loss": loss, "accuracy": acc}

    return jax.jit(step, donate_argnums=(0,))
