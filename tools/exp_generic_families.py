"""Generic interception int8 vs bf16 for compute-heavy fallback families.

serve auto mode sends non-pipeline families to bf16 because the generic
quantizer (bf16 activations, int8 dense convs) measured SLOWER for the
HBM-bound families in round 1. That verdict should NOT extend to the
compute-dominated ones — this measures each candidate so auto-routing
is driven by per-family data, the same policy as the dw families.

Note the generic path re-quantizes weights in-graph every step (they are
jit inputs), so a win here is a lower bound on the prepared-storage win.

MEASURED (v5e, 2026-08-17):
  inceptionv3        b128: bf16 7421 | int8 7243  (0.98x - wash)
  inceptionv4        b96:  bf16 3539 | int8 3184  (0.90x)
  xception           b128: bf16 3655 | int8 2459  (0.67x - dw convs)
  darknet53          b256: bf16 9072 | int8 11617 (1.28x WIN ->
                     dedicated storage pipeline, quant/darknet_int8.py)
  vovnet39           b256: bf16 8010 | int8 6843  (0.85x - concats)
  pyramidnet101_a360 b128: bf16 5672 | int8 5138  (0.91x)
  densenet121        b256: bf16 6223 | int8 3677  (0.59x - concats)
VERDICT: only darknet53 wins; the concat/branch-heavy families lose to
the quant chains around every conv. auto mode keeps bf16 for them.

Usage: python tools/exp_generic_families.py [name ...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 10

# (model, in_size, batch) — batches sized for v5e HBM at bf16.
CASES = {
    "inceptionv3": (299, 128),
    "inceptionv4": (299, 96),
    "xception": (299, 128),
    "darknet53": (224, 256),
    "vovnet39": (224, 256),
    "pyramidnet101_a360": (224, 128),
    "densenet121": (224, 256),
}


def time_fn(fn, tree, x):
    @functools.partial(jax.jit, static_argnums=2)
    def run_n(tree, x, n):
        def body(carry, i):
            y = fn(tree, x + i.astype(x.dtype) * jnp.asarray(1e-4, x.dtype))
            return carry + y.astype(jnp.float32).sum(), None
        carry, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                jnp.arange(n))
        return carry

    float(run_n(tree, x, ITERS))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(run_n(tree, x, ITERS))
        best = min(best, (time.time() - t0) / ITERS)
    return best


def main():
    names = sys.argv[1:] or list(CASES)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.quant import calibrate_int8, int8_apply_fn

    for name in names:
        size, batch = CASES[name]
        try:
            model = ptc.get_model(name)
            calib = [jax.random.uniform(jax.random.PRNGKey(0),
                                        (4, size, size, 3),
                                        minval=-2.1, maxval=2.6)]
            scales = calibrate_int8(model, calib)
            fn8 = int8_apply_fn(model, scales)
            bf = model.as_bfloat16()
            bvars = bf.variables

            def bf16_fn(tree, x):
                return bf.module.apply(tree, x, train=False)

            x = jnp.asarray(
                np.random.RandomState(0).rand(batch, size, size, 3),
                jnp.bfloat16)
            dtb = time_fn(bf16_fn, bvars, x)
            dt8 = time_fn(fn8, model.variables, x)
            print(f"{name:20s} batch {batch:4d}: "
                  f"bf16 {batch/dtb:7.0f} img/s | "
                  f"int8 {batch/dt8:7.0f} img/s | "
                  f"ratio {dtb/dt8:5.2f}x", flush=True)
        except Exception as e:
            print(f"{name:20s} ERROR {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
