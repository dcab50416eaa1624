"""E2E int8 resnet50 A/B: bf16-domain vs quantized-domain residual adds.

The int8 pipeline sits at ~89-93% of the HBM roof for its traffic; the
bf16 residual tensors in stages 1-2 are 2x the bytes of int8 ones. Round
1 A/B'd q_residual at some point and kept bf16; re-measure both e2e at
the bench configuration (batch 384) to confirm on current XLA.

Usage: python tools/exp_e2e.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 384
ITERS = 200


def time_fn(fn, qtree, x):
    @functools.partial(jax.jit, static_argnums=2)
    def run_n(qtree, x, n):
        def body(carry, i):
            y = fn(qtree, x + i.astype(x.dtype) * jnp.asarray(1e-4, x.dtype))
            return carry + y.astype(jnp.float32).sum(), None
        carry, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                jnp.arange(n))
        return carry

    float(run_n(qtree, x, ITERS))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(run_n(qtree, x, ITERS))
        best = min(best, (time.time() - t0) / ITERS)
    return best


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.quant import calibrate_int8
    from pytorchcv_tpu.quant.resnet_int8 import prepare_int8_resnet

    model = ptc.get_model("resnet50")
    scales = calibrate_int8(
        model, [jax.random.uniform(jax.random.PRNGKey(0), (8, 224, 224, 3))])
    x = jnp.asarray(np.random.RandomState(0).rand(BATCH, 224, 224, 3),
                    jnp.bfloat16)

    for qr in (False, True):
        fn, qtree = prepare_int8_resnet(model, scales, q_residual=qr)
        dt = time_fn(fn, qtree, x)
        print(f"q_residual={qr}: {dt*1e3:7.3f} ms/iter  "
              f"{BATCH/dt:8.0f} img/s")


if __name__ == "__main__":
    main()
