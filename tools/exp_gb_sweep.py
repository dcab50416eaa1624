"""Sweep the grouped-conv merge factor for int8 ResNeXt e2e.

group_block=None keeps XLA's native grouped conv; 32/128 merge to
block-diagonal groups of that many channels; 10**6 merges fully dense
(feature_group_count=1, zero off-block weights).

Usage: python tools/exp_gb_sweep.py [model] [batch]
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
    name = sys.argv[1] if len(sys.argv) > 1 else "resnext50_32x4d"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 384
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.quant import calibrate_int8
    from pytorchcv_tpu.quant.resnet_int8 import prepare_int8_resnet

    model = ptc.get_model(name)
    scales = calibrate_int8(
        model, [jax.random.uniform(jax.random.PRNGKey(0),
                                   (8, 224, 224, 3))])
    x = jnp.asarray(np.random.RandomState(0).rand(batch, 224, 224, 3),
                    jnp.bfloat16)
    for gb in (None, 32, 128, 10 ** 6):
        fn, qtree = prepare_int8_resnet(model, scales, group_block=gb)
        dt = time_fn(fn, qtree, x)
        print(f"group_block={str(gb):7s}: {dt*1e3:7.3f} ms  "
              f"{batch/dt:8.0f} img/s", flush=True)


if __name__ == "__main__":
    main()
