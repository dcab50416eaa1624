"""Round-2 family benchmarks: grouped-conv densification + dw int8.

Measures (batch from STATUS table conventions):
- resnext50_32x4d / senet52 int8 with the final group_block policy
- mobilenetv2_w1 / mobilenetv3_large / efficientnet_b0: bf16 vs
  int8-storage (mobilenet pipeline; effnet only if tree matches)

Usage: python tools/exp_family_bench.py [which ...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 150


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


def bench_resnet_like(name, batch=384):
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.quant import calibrate_int8
    from pytorchcv_tpu.quant.resnet_int8 import prepare_int8_resnet
    model = ptc.get_model(name)
    scales = calibrate_int8(
        model, [jax.random.uniform(jax.random.PRNGKey(0),
                                   (8, 224, 224, 3))])
    fn, qtree = prepare_int8_resnet(model, scales)
    x = jnp.asarray(np.random.RandomState(0).rand(batch, 224, 224, 3),
                    jnp.bfloat16)
    dt = time_fn(fn, qtree, x)
    print(f"{name:20s} int8(gb=32) batch{batch}: {dt*1e3:7.3f} ms  "
          f"{batch/dt:8.0f} img/s", flush=True)


def bench_dw_family(name, batch=512):
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.quant import calibrate_int8
    from pytorchcv_tpu.quant.mobilenet_int8 import (is_mobilenet_v2_tree,
                                                    prepare_int8_mobilenet)
    model = ptc.get_model(name)
    x = jnp.asarray(np.random.RandomState(0).rand(batch, 224, 224, 3),
                    jnp.bfloat16)

    bf = model.as_bfloat16()
    bfv = bf.variables
    fn_bf = lambda v, xx: bf.module.apply(v, xx, train=False)
    dt = time_fn(fn_bf, bfv, x)
    print(f"{name:20s} bf16 batch{batch}: {dt*1e3:7.3f} ms  "
          f"{batch/dt:8.0f} img/s", flush=True)

    from pytorchcv_tpu.quant.efficientnet_int8 import (
        is_efficientnet_module, prepare_int8_efficientnet)
    if is_mobilenet_v2_tree(model.variables):
        prep = prepare_int8_mobilenet
    elif is_efficientnet_module(model):
        prep = prepare_int8_efficientnet
    else:
        print(f"{name:20s} no int8-storage pipeline; skipped", flush=True)
        return
    scales = calibrate_int8(
        model, [jax.random.uniform(jax.random.PRNGKey(0),
                                   (8, 224, 224, 3))])
    for dw_bf16 in (False, True):
        fn, qtree = prep(model, scales, dw_bf16=dw_bf16)
        dt = time_fn(fn, qtree, x)
        print(f"{name:20s} int8-storage(dw_bf16={dw_bf16}) "
              f"batch{batch}: {dt*1e3:7.3f} ms  {batch/dt:8.0f} img/s",
              flush=True)


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    which = sys.argv[1:] or ["resnext50_32x4d", "senet52",
                             "mobilenetv2_w1"]
    for name in which:
        if "resnext" in name or "senet" in name or "resnet" in name:
            bench_resnet_like(name)
        else:
            bench_dw_family(name)


if __name__ == "__main__":
    main()
