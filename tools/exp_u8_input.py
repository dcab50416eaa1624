"""A/B: bf16 image input vs uint8 pixels cast inline at the stem.

VERDICT r2 item 2 suggested an int8-quantized input feed so the stem
reads 1-byte pixels. The shipped headline feeds bf16 (B,224,224,3) =
116 MB/iter at batch 384; a uint8 feed halves that read (~0.07 ms at
819 GB/s, ~0.45% of the 15.0 ms step) IF XLA fuses the u8->bf16 cast
into the stem conv's input read instead of materializing the cast.

Same scan-chained timing as bench.py (axon block_until_ready does not
sync; see bench.py docstring).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "384"))
ITERS = int(os.environ.get("BENCH_ITERS", "500"))


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
    fn, qtree = prepare_int8_resnet(model, scales)

    def make_run(cast):
        @functools.partial(jax.jit, static_argnums=2)
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
                y = fn(qt, cast(x))
                return carry + y.astype(jnp.float32).sum(), None
            carry, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                    jnp.arange(n))
            return carry
        return run_n

    rs = np.random.RandomState(0)
    img = rs.rand(BATCH, 224, 224, 3)

    def bench(name, x, cast):
        run = make_run(cast)
        float(run(qtree, x, ITERS))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(run(qtree, x, ITERS))
            best = min(best, (time.time() - t0) / ITERS)
        print(f"{name}: {BATCH / best:,.1f} img/s ({best * 1e3:.3f} ms)")

    bench("bf16 input (shipped)", jnp.asarray(img, jnp.bfloat16),
          lambda x: x)
    bench("uint8 input, inline cast",
          jnp.asarray((img * 255).round(), jnp.uint8),
          lambda x: x.astype(jnp.bfloat16) * jnp.asarray(1 / 255.0,
                                                         jnp.bfloat16))


if __name__ == "__main__":
    main()
