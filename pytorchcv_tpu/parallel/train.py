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

__all__ = ["TrainState", "create_train_state", "fsdp_pspecs",
           "make_train_step", "param_pspecs", "shard_train_state"]


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any = None


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


def fsdp_pspecs(params, n_shards: int, axis: str = "data",
                min_shard_elems: int = 4096):
    """Fully-sharded (ZeRO-3 style) partition specs: every big leaf is
    sharded over the *data* axis on its largest divisible dimension.

    Params, their gradients, and the optimizer moments (which inherit the
    params' layout, see ``shard_train_state``) then all live 1/n-sharded in
    HBM; XLA's SPMD partitioner inserts the all-gather at each use and the
    reduce-scatter on the gradients — the hand-written gather/scatter of
    torch-style FSDP is emergent, not coded. Small leaves (BN vectors,
    biases) replicate: gathering them costs more than storing them.
    """

    def spec_for(x):
        if x.size < min_shard_elems:
            return P()
        cands = [d for d in range(x.ndim) if x.shape[d] % n_shards == 0]
        if not cands:
            return P()
        d = max(cands, key=lambda d: x.shape[d])
        spec = [None] * x.ndim
        spec[d] = axis
        return P(*spec)

    return jax.tree_util.tree_map(spec_for, params)


def create_train_state(model, tx: optax.GradientTransformation,
                       ema: bool = False) -> TrainState:
    variables = model.variables
    assert variables is not None, "model must be initialized"
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.array, params) if ema
        else None,
    )


def shard_train_state(model, tx: optax.GradientTransformation, mesh: Mesh,
                      min_tp_features: int = 256,
                      style: str = "tp", ema: bool = False) -> TrainState:
    """Build a TrainState laid out over ``mesh``.

    ``style='tp'`` shards wide kernels over ``model`` (tensor parallel);
    ``style='fsdp'`` shards every big leaf over ``data`` (ZeRO-3 — params,
    grads and moments all 1/n per chip, see ``fsdp_pspecs``).

    Params are device_put with the chosen specs; the optimizer state is
    created *inside jit from the sharded params*, so its leaves inherit the
    params' layout without a per-leaf spec table.
    """
    variables = model.variables
    assert variables is not None, "model must be initialized"
    if style == "tp":
        specs = param_pspecs(variables["params"], min_tp_features)
    elif style == "fsdp":
        specs = fsdp_pspecs(variables["params"], mesh.shape["data"])
    else:
        raise ValueError(f"unknown sharding style: {style!r}")
    params = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        variables["params"], specs)
    repl = NamedSharding(mesh, P())
    stats = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl),
        variables.get("batch_stats", {}))

    @jax.jit
    def init(params, stats):
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            batch_stats=stats, opt_state=tx.init(params),
            # EMA shadows inherit the params' (tp or fsdp) layout
            ema_params=jax.tree_util.tree_map(jnp.array, params) if ema
            else None)

    return init(params, stats)


def make_train_step(model, tx: optax.GradientTransformation,
                    accum_steps: int = 1, remat: bool = False,
                    ema_decay: float = 0.999) -> Callable:
    """jitted ``step(state, images, labels) -> (state, metrics)``.

    Shardings follow the placement of ``state`` (see ``shard_train_state``)
    and the batch (see ``inference.shard_batch``); ``state`` buffers are
    donated. The *output* state is pinned to the input state's shardings
    (``out_shardings``): without the pin, GSPMD is free to pick a new layout
    for the updated params each compile, which both breaks the donation
    aliasing and poisons downstream jits with involuntary full
    rematerializations (observed on the TP->spatial handoff in
    ``dryrun_multichip``).

    ``remat=True`` wraps the forward in ``jax.checkpoint`` — activations are
    recomputed in the backward pass instead of held in HBM (identical math,
    the TPU memory/FLOPs trade). ``accum_steps=k`` splits the batch into k
    microbatches and runs them through a ``lax.scan`` that sums gradients
    (BN stats carry forward sequentially) before the single optimizer
    update — peak activation memory drops k-fold at full effective batch.
    Each microbatch gets an independent dropout key (step and microbatch
    index both folded in), matching full-batch semantics.

    ``ema_decay`` drives the exponential moving average of the params when
    the state was created with ``ema=True`` (``state.ema_params`` shadows).
    """

    def apply_fn(params, batch_stats, images, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        return model.module.apply(
            variables, images, train=True, mutable=["batch_stats"],
            rngs={"dropout": rng})

    if remat:
        apply_fn = jax.checkpoint(apply_fn)

    def loss_fn(params, batch_stats, images, labels, rng):
        logits, mutated = apply_fn(params, batch_stats, images, rng)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()
        acc = (logits.argmax(-1) == labels).mean()
        return loss, (mutated["batch_stats"], acc)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def accum_grads(state, images, labels, rng):
        """Microbatched gradient: mean over `accum_steps` scan iterations."""
        k = accum_steps
        assert images.shape[0] % k == 0, (
            f"batch {images.shape[0]} not divisible by accum_steps={k}")
        im = images.reshape(k, images.shape[0] // k, *images.shape[1:])
        lb = labels.reshape(k, labels.shape[0] // k, *labels.shape[1:])

        def body(carry, xs):
            stats, gsum, lsum, asum = carry
            im_i, lb_i, idx = xs
            (loss, (stats, acc)), grads = grad_fn(
                state.params, stats, im_i, lb_i,
                jax.random.fold_in(rng, idx))
            gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
            return (stats, gsum, lsum + loss, asum + acc), None

        gzero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (stats, gsum, lsum, asum), _ = jax.lax.scan(
            body, (state.batch_stats, gzero, 0.0, 0.0),
            (im, lb, jnp.arange(k)))
        mean = lambda t: jax.tree_util.tree_map(lambda g: g / k, t)
        return lsum / k, stats, asum / k, mean(gsum)

    def step(state: TrainState, images, labels):
        rng = jax.random.fold_in(jax.random.PRNGKey(0), state.step)
        if accum_steps == 1:
            (loss, (new_stats, acc)), grads = grad_fn(
                state.params, state.batch_stats, images, labels, rng)
        else:
            loss, new_stats, acc, grads = accum_grads(
                state, images, labels, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            ema = jax.tree_util.tree_map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                ema, params)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_stats, opt_state=opt_state,
                                  ema_params=ema)
        return new_state, {"loss": loss, "accuracy": acc}

    # One jit per observed input-state layout, outputs pinned to it.
    _jits: dict = {}

    def jitted_step(state: TrainState, images, labels):
        leaves, treedef = jax.tree_util.tree_flatten(state)
        shardings = tuple(leaf.sharding for leaf in leaves)
        fn = _jits.get((treedef, shardings))
        if fn is None:
            state_sh = jax.tree_util.tree_unflatten(treedef, list(shardings))
            scalar_sh = state.step.sharding
            fn = jax.jit(
                step, donate_argnums=(0,),
                out_shardings=(state_sh, {"loss": scalar_sh,
                                          "accuracy": scalar_sh}))
            _jits[(treedef, shardings)] = fn
        return fn(state, images, labels)

    return jitted_step
