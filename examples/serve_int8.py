"""int8 serving pipeline: uint8 images -> logits in one jitted program.

    python examples/serve_int8.py [model_name]

Preprocess (PIL-exact resize/crop/normalize as MXU matmuls) + int8 PTQ
forward (int8-storage pipeline for ResNets; see docs/DESIGN.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pytorchcv_tpu.serve import make_serving_fn


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "resnet50"
    serve = make_serving_fn(name, source_hw=(256, 256))
    raw = np.random.RandomState(0).randint(0, 256, (32, 256, 256, 3),
                                           np.uint8)
    batch = jnp.asarray(raw)
    logits = serve(batch)                      # compile + run
    t0 = time.time()
    logits = jax.block_until_ready(serve(batch))
    print(f"{name}: {raw.shape} uint8 -> {logits.shape} logits "
          f"({(time.time()-t0)*1e3:.1f} ms warm, includes dispatch)")


if __name__ == "__main__":
    main()
