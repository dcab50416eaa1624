"""Server-side XLA compiler-option sweep on the int8 resnet50 bench step.

STATUS round-3 rejected XLA_FLAGS tuning because the axon client rejects
TPU flags (compilation happens server-side).  ``jax.jit(...,
compiler_options=...)`` is the channel that DOES reach the server-side
compiler: options are embedded in the compile request's debug_options.
This sweeps plausible single-chip inference options against the exact
bench.py step (batch 384, ITERS chained in a scan).

Usage: python tools/exp_compiler_opts.py [ITERS]

MEASURED (v5e, 2026-08-19, ITERS=300):
  baseline            25330.4 img/s (15.160 ms)
  vmem64m             23803.1 img/s (16.132 ms)   <- HURTS: bigger scoped
  vmem96m             23572.7 img/s (16.290 ms)      VMEM makes the fusion
  lhs                 25325.4 img/s (15.163 ms)      autotuner pick worse tiles
  multi_fusion        25330.8 img/s (15.159 ms)
  vmem64m+lhs         23803.8 img/s (16.132 ms)
Conclusion: the compiler_options channel works (reaches the server-side
compiler) but no option beats the default on this workload; the defaults
are already tuned for it. Headline stays 25.3k img/s.
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
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 300

CONFIGS = {
    "baseline": None,
    # More scoped VMEM for fusions (default 16 MB; v5e has 128 MB VMEM).
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    # Latency-hiding scheduler (mostly for collectives, but also
    # reorders copies/compute on one chip).
    "lhs": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    # Aggressive fusion knobs.
    "multi_fusion": {
        "xla_tpu_enable_dot_strength_reduction": "true",
    },
    "vmem64m+lhs": {
        "xla_tpu_scoped_vmem_limit_kib": "65536",
        "xla_tpu_enable_latency_hiding_scheduler": "true",
    },
}


def build():
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.quant import calibrate_int8
    from pytorchcv_tpu.quant.resnet_int8 import prepare_int8_resnet

    model = ptc.get_model("resnet50")
    scales = calibrate_int8(
        model, [jax.random.uniform(jax.random.PRNGKey(0), (8, 224, 224, 3))])
    fn, qtree = prepare_int8_resnet(model, scales)

    def run_n(qtree, x, n):
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
    return run_n, qtree, x


def main():
    run_n, qtree, x = build()
    for name, opts in CONFIGS.items():
        try:
            jf = jax.jit(run_n, static_argnums=2,
                         compiler_options=opts) if opts else \
                jax.jit(run_n, static_argnums=2)
            float(jf(qtree, x, ITERS))          # compile
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                float(jf(qtree, x, ITERS))
                best = min(best, (time.time() - t0) / ITERS)
            print(f"{name:16s} {BATCH / best:10.1f} img/s "
                  f"({best * 1e3:.3f} ms)", flush=True)
        except Exception as e:  # noqa: BLE001 - report per-config failure
            print(f"{name:16s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
