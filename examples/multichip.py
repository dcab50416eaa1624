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


if __name__ == "__main__":
    main()
