"""VGG int8-storage vs bf16 on the real chip.

vgg16 is ~31 GOP/image — the zoo's most compute-dominated classic — so
the int8 MXU (386 TOP/s measured vs 197 bf16 TFLOP/s) should be a ~2x
lever, unlike the HBM-bound families where int8-storage fights for
traffic only.

Usage: python tools/exp_vgg.py [model] [batch ...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 20


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
    name = sys.argv[1] if len(sys.argv) > 1 else "vgg16"
    batches = [int(a) for a in sys.argv[2:]] or [128, 256]
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.quant import calibrate_int8
    from pytorchcv_tpu.quant.vgg_int8 import prepare_int8_vgg

    model = ptc.get_model(name)
    calib = [jax.random.uniform(jax.random.PRNGKey(0), (8, 224, 224, 3),
                                minval=-2.1, maxval=2.6)]
    scales = calibrate_int8(model, calib)
    fn, qtree = prepare_int8_vgg(model, scales)
    bf = model.as_bfloat16()
    bvars = bf.variables

    def bf16_fn(tree, x):
        return bf.module.apply(tree, x, train=False)

    for batch in batches:
        x = jnp.asarray(np.random.RandomState(0).rand(batch, 224, 224, 3),
                        jnp.bfloat16)
        dt8 = time_fn(fn, qtree, x)
        dtb = time_fn(bf16_fn, bvars, x)
        print(f"{name} batch {batch}: int8 {dt8*1e3:7.2f} ms "
              f"({batch/dt8:7.0f} img/s) | bf16 {dtb*1e3:7.2f} ms "
              f"({batch/dtb:7.0f} img/s)", flush=True)


if __name__ == "__main__":
    main()
