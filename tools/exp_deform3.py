"""Pallas bounded-window deform sampler vs the XLA formulations at the
ProPainter feat-prop shape.

Run on the real chip: python tools/exp_deform3.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pytorchcv_tpu.nn.deform import (_deform_footprint, _deform_general,
                                     deform_conv2d)
from exp_deform import timeit


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    b, h, w, c, g = 1, 60, 108, 128, 16
    k2 = 9
    for dtype, bound in ((jnp.bfloat16, 3.0), (jnp.float32, 3.0),
                         (jnp.bfloat16, 5.0)):
        x = jnp.asarray(rng.randn(b, h, w, c), dtype)
        flow = rng.randn(b, h, w, 1, 1, 2) * 12.0
        resid = np.tanh(rng.randn(b, h, w, g, k2, 2)) * bound
        offset = jnp.asarray((flow + resid).reshape(b, h, w, g * k2 * 2),
                             dtype)
        center = jnp.asarray(flow.reshape(b, h, w, 2), jnp.float32)
        mask = jnp.asarray(1 / (1 + np.exp(-rng.randn(b, h, w, g * k2))),
                           dtype)
        kernel = jnp.asarray(rng.randn(3, 3, c, c) * 0.05, dtype)
        bias = jnp.asarray(rng.randn(c) * 0.1, dtype)

        ref = _deform_general(x, offset, mask, kernel, bias, 1, 1, g)

        variants = {
            "footprint": lambda *a: _deform_footprint(*a[:5], 1, 1, g),
            "pallas-window": lambda *a: deform_conv2d(
                *a, stride=1, padding=1, deform_groups=g,
                center=center, residue_bound=bound),
        }
        print(f"=== {dtype.__name__} bound={bound} ===", flush=True)
        for name, fn in variants.items():
            out = fn(x, offset, mask, kernel, bias)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) -
                                        ref.astype(jnp.float32))))
            scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
            ms = timeit(fn, x, offset, mask, kernel, bias)
            print(f"{name:16s}: {ms:8.3f} ms   maxerr {err:.2e} "
                  f"(scale {scale:.1f})", flush=True)


if __name__ == "__main__":
    main()
