"""Segmentation serving A/B: int8 resnetd backbone vs bf16, e2e
(uint8 -> class maps) at the VOC protocol (480x480).

bf16 measured 425 img/s (pspnet) / 484 (deeplabv3) at batch 8 — ~99% of
the bf16 FLOP roofline (STATUS.md), i.e. compute-bound: exactly the
case the int8 MXU (2x bf16 peak) is built for.

Usage: python tools/exp_seg_serve.py
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


def time_fn(serve, raw):
    @functools.partial(jax.jit, static_argnums=1)
    def run_n(raw, n):
        def body(carry, i):
            y = serve(raw ^ (i % 2).astype(jnp.uint8))
            main = y[0] if isinstance(y, (tuple, list)) else y
            return carry + main.astype(jnp.float32).sum(), None
        carry, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                jnp.arange(n))
        return carry

    float(run_n(raw, 1))
    float(run_n(raw, ITERS))
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); float(run_n(raw, 1))
        t1 = time.time(); float(run_n(raw, ITERS))
        t2 = time.time()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (ITERS - 1))
    return best


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    from pytorchcv_tpu.serve import make_serving_fn

    rs = np.random.RandomState(0)
    for name in ("pspnet_resnetd50b_voc", "deeplabv3_resnetd50b_voc"):
        for batch in (8, 16):
            raw = jnp.asarray(
                rs.randint(0, 256, (batch, 512, 512, 3)), jnp.uint8)
            for mode in ("auto", "bf16"):
                serve = make_serving_fn(name, source_hw=(512, 512),
                                        task="segmentation", mode=mode,
                                        aux=False)
                s = time_fn(serve, raw)
                print(f"{name:28s} b{batch:<3d} {mode:5s} "
                      f"{s*1e3:8.2f} ms  {batch/s:8.1f} img/s", flush=True)

    # Pose: int8 plain trunk + bf16 deconv decoder + heatmap decode.
    for batch in (64, 128):
        raw = jnp.asarray(
            rs.randint(0, 256, (batch, 256, 192, 3)), jnp.uint8)
        for mode in ("auto", "bf16"):
            serve = make_serving_fn("simplepose_resnet50b_coco",
                                    source_hw=(256, 192), task="pose",
                                    mode=mode)
            s = time_fn(serve, raw)
            print(f"{'simplepose_resnet50b_coco':28s} b{batch:<3d} "
                  f"{mode:5s} {s*1e3:8.2f} ms  {batch/s:8.1f} img/s",
                  flush=True)


if __name__ == "__main__":
    main()
