"""Driver benchmark: resnet50 bf16 batched inference, images/sec/chip.

Measurement methodology: the axon tunnel's ``block_until_ready`` does not
synchronize with device execution, so timing wraps N model invocations in
one jitted ``lax.scan`` (serialized by a scalar carry) and fetches the final
scalar to the host; per-iteration time = (wall_N - wall_1) / (N - 1).

Baseline: A100 TensorRT fp16 resnet50 ~= 25,000 img/s (driver's north star;
the reference itself publishes no throughput numbers — BASELINE.md).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_S = 25000.0
MODEL = "resnet50"
BATCH = 256
ITERS = 8


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    import pytorchcv_tpu as ptc

    model = ptc.get_model(MODEL).as_bfloat16()

    @functools.partial(jax.jit, static_argnums=2)
    def run_n(variables, x, n):
        def body(carry, i):
            y = model.module.apply(
                variables, x + i.astype(x.dtype) * jnp.asarray(1e-4, x.dtype),
                train=False)
            return carry + y.sum().astype(jnp.float32), None
        carry, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                jnp.arange(n))
        return carry

    x = jnp.asarray(np.random.RandomState(0).rand(BATCH, 224, 224, 3),
                    jnp.bfloat16)
    variables = model.variables

    float(run_n(variables, x, 1))      # compile 1-iter program
    float(run_n(variables, x, ITERS))  # compile N-iter program

    # best-of-3 to shave host noise
    per_iter = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(run_n(variables, x, 1))
        t1 = time.time()
        float(run_n(variables, x, ITERS))
        t2 = time.time()
        per_iter = min(per_iter, ((t2 - t1) - (t1 - t0)) / (ITERS - 1))

    img_s = BATCH / per_iter
    print(json.dumps({
        "metric": f"{MODEL} bf16 inference throughput (batch {BATCH}, NHWC)",
        "value": round(img_s, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s / BASELINE_IMG_S, 3),
    }))


if __name__ == "__main__":
    main()
