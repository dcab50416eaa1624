"""Driver benchmark: resnet50 int8-serving inference, images/sec/chip.

Serving path: post-training int8 quantization (pytorchcv_tpu.quant) with
activations stored int8 between layers, BN folded into per-channel dequant
scales, and the 7x7 stem space-to-depth'd onto full MXU lanes. On v5e the
int8 MXU (~386 TOP/s measured) is what makes the A100-TensorRT-class
target approachable on one chip; bf16 peak (~197 TFLOP/s) caps the bf16
model at ~13.7k img/s.

Measurement: the axon tunnel's ``block_until_ready`` does not synchronize
with device execution, so N invocations are chained in one jitted
``lax.scan`` (serialized by a scalar carry with an iteration-dependent
input so XLA cannot hoist the body) and the wall time of the whole scan is
divided by N — dispatch overhead amortizes to <1%.

Baseline: A100 TensorRT fp16 resnet50 ~= 25,000 img/s (driver's north
star; the reference itself publishes no throughput numbers — BASELINE.md).
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
BATCH = int(os.environ.get("BENCH_BATCH", "384"))
# One run_n call = one dispatch through the axon tunnel (~25 ms RTT) +
# ITERS chained steps; steady-state serving amortizes dispatch. Measured
# RTT/ITERS inflation: ITERS=200 leaves ~1% on the wall clock (25.26k
# vs 25.43k img/s at 1000); 1000 leaves ~0.2%.
ITERS = int(os.environ.get("BENCH_ITERS", "1000"))


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.quant import calibrate_int8
    from pytorchcv_tpu.quant.resnet_int8 import prepare_int8_resnet

    model = ptc.get_model(MODEL)
    scales = calibrate_int8(
        model, [jax.random.uniform(jax.random.PRNGKey(0), (8, 224, 224, 3))])
    fn, qtree = prepare_int8_resnet(model, scales)

    @functools.partial(jax.jit, static_argnums=2)
    def run_n(qtree, x, n):
        # Hoisting guard: XLA's loop-invariant code motion would pull an
        # i-independent body out of the scan. Perturbing the 18 KB stem
        # KERNEL (not the 116 MB input: that add alone costs ~0.28 ms of
        # HBM traffic per step, ~2% of the measurement) makes the stem
        # conv — and everything downstream — depend on i at zero cost;
        # the input read still happens every iteration (x lives in HBM,
        # far beyond VMEM residency). The bf16 add of i*1e-8 rounds to
        # zero numerically but cannot be folded: i is loop-carried.
        def body(carry, i):
            eps = i.astype(jnp.bfloat16) * jnp.asarray(1e-8, jnp.bfloat16)
            qt = dict(qtree)
            f = dict(qt["features"])
            ib = dict(f["init_block"])
            conv = dict(ib["conv"])
            conv["kf"] = conv["kf"] + eps
            ib["conv"] = conv
            f["init_block"] = ib
            qt["features"] = f
            y = fn(qt, x)
            return carry + y.astype(jnp.float32).sum(), None
        carry, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                jnp.arange(n))
        return carry

    x = jnp.asarray(np.random.RandomState(0).rand(BATCH, 224, 224, 3),
                    jnp.bfloat16)

    float(run_n(qtree, x, ITERS))          # compile
    per_iter = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(run_n(qtree, x, ITERS))
        t1 = time.time()
        per_iter = min(per_iter, (t1 - t0) / ITERS)

    img_s = BATCH / per_iter
    print(json.dumps({
        "metric": f"{MODEL} int8-PTQ inference throughput "
                  f"(batch {BATCH}, NHWC, int8 activations)",
        "value": round(img_s, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s / BASELINE_IMG_S, 3),
    }))


if __name__ == "__main__":
    main()
