"""Multi-chip data-parallel inference on a device mesh.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip.py

On real hardware drop the env vars — the same code runs over TPU chips
with XLA collectives riding ICI.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import jax.numpy as jnp

import pytorchcv_tpu as ptc
from pytorchcv_tpu.parallel import (data_parallel_infer_fn, make_mesh,
                                    shard_batch)


def main():
    devices = jax.devices()
    mesh = make_mesh((len(devices),), ("data",), devices=devices)
    model = ptc.get_model("resnet18")
    fn = data_parallel_infer_fn(model, mesh, donate_input=False)
    x = shard_batch(mesh, jnp.asarray(
        np.random.RandomState(0).rand(8 * len(devices), 224, 224, 3),
        jnp.float32))
    logits = fn(model.variables, x)
    print(f"mesh {dict(mesh.shape)}: batch {x.shape[0]} -> "
          f"logits {logits.shape}, sharding {logits.sharding}")

    # Spatial partitioning: ONE large image spans the mesh (H-axis
    # sharded; XLA inserts the conv halo exchanges) — the latency path
    # for huge segmentation inputs.
    from pytorchcv_tpu.parallel import spatial_infer_fn
    seg = ptc.get_model("fastscnn_cityscapes", in_size=(512, 1024))
    sp = spatial_infer_fn(seg, mesh, axis="data")
    big = jnp.asarray(np.random.RandomState(1).rand(1, 512, 1024, 3),
                      jnp.float32)
    out = sp(seg.variables, big)
    main_out = out[0] if isinstance(out, (tuple, list)) else out
    print(f"spatial: {big.shape} -> {main_out.shape}")

    # Multi-host (DCN) feeding: each process contributes its local
    # shard; single-process runs degrade to a sharded device_put. On a
    # pod: parallel.initialize_multihost() once per process first.
    from pytorchcv_tpu.parallel import feed_sharded, make_global_mesh
    gmesh = make_global_mesh((len(devices), 1))
    fed = feed_sharded(gmesh, np.random.RandomState(2).rand(
        2 * len(devices), 224, 224, 3).astype(np.float32))
    fn_g = data_parallel_infer_fn(model, gmesh, donate_input=False)
    print(f"multihost feed: {fed.shape} -> "
          f"{fn_g(model.variables, fed).shape}")


if __name__ == "__main__":
    main()
