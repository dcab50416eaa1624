"""Multi-host (DCN) execution helpers.

The reference has no distributed code (SURVEY.md §2.5); on TPU pods the
idiomatic scale-out is: one process per host, `jax.distributed.initialize`
over DCN, ONE global mesh spanning every chip, and per-host input feeding
with `jax.make_array_from_process_local_data`. XLA then routes
collectives over ICI within a slice and DCN across hosts — there is no
NCCL/MPI analog to manage.

Single-host processes (tests, the axon chip, the CPU-8 virtual mesh) use
the same API: `initialize_multihost` is a no-op when no coordinator is
configured, and `feed_sharded` degenerates to a `device_put`.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_mesh

__all__ = ["initialize_multihost", "make_global_mesh", "feed_sharded"]


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Join the JAX distributed runtime (DCN) — call ONCE, before any
    device use.

    No-op unless a coordinator is explicitly configured — either via
    arguments or `JAX_COORDINATOR_ADDRESS` in the environment. (On Cloud
    TPU pods, pass no address but set the env var, or call
    `jax.distributed.initialize()` directly to use pod auto-detection;
    the explicit opt-in here keeps single-host runs — tests, one-chip
    serving — from trying to join a cluster.)
    """
    import os
    if coordinator_address is None and \
            "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return                      # single process: nothing to join
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_global_mesh(axis_shapes: Optional[Tuple[int, ...]] = None,
                     axis_names: Sequence[str] = ("data", "model")
                     ) -> Mesh:
    """Mesh over ALL devices in the job (every host's chips).

    `jax.devices()` is global after `initialize_multihost`; axis order
    keeps hosts contiguous on the leading (data) axis so data-parallel
    collectives ride ICI within a slice and only metric reductions cross
    DCN.
    """
    return make_mesh(axis_shapes, axis_names, devices=jax.devices())


def feed_sharded(mesh: Mesh, local_batch, spec: P = P("data")):
    """Assemble a GLOBAL array from this process's local shard.

    ``local_batch``: the numpy/host array this host contributes (its
    slice of the global batch). Every process calls this with its own
    shard; the result is one global jax.Array laid out per ``spec`` that
    can be passed straight into a jitted/sharded function. Single-process
    setting: equivalent to a sharded `device_put`.
    """
    sharding = NamedSharding(mesh, spec)
    local_batch = np.asarray(local_batch)
    return jax.make_array_from_process_local_data(sharding, local_batch)
