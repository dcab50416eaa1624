"""Depthwise-family int8 microbenchmarks (mobilenetv2/v3, efficientnet).

Round 1: generic int8 measured slower than bf16 for mobilenets (bf16
38.4k img/s vs int8 34.7k) because activations stayed bf16 — the extra
quant ops added work without cutting HBM traffic. The int8-storage fix
needs two primitives to win at the layer level:

1. 1x1 conv (expand/project): int8xint8->int32 matmul, int8 in/out.
2. depthwise 3x3: int8 in -> conv (XLA, feature_group_count=C) -> fused
   relu6/hswish epilogue -> int8 out. The dw conv is VPU work in any
   dtype; the win is the halved activation bytes around it.

This measures each at mobilenetv2_w1 batch-512 shapes, bf16 vs
int8-storage, to validate the layer-level wins before building the
pipeline.

Usage: python tools/exp_dw.py
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
B = 512


def timeit(fn, *args):
    @functools.partial(jax.jit, static_argnums=0)
    def run_n(n, *a):
        def body(carry, i):
            def vary(x):
                if x.dtype == jnp.int8:
                    return x ^ (i % 2).astype(jnp.int8)
                return x + (i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype))
            out = fn(*jax.tree_util.tree_map(vary, a))
            return carry + jax.tree_util.tree_leaves(out)[0].astype(
                jnp.float32).sum(), None
        carry, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                jnp.arange(n))
        return carry

    float(run_n(1, *args))
    float(run_n(ITERS, *args))
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); float(run_n(1, *args))
        t1 = time.time(); float(run_n(ITERS, *args))
        t2 = time.time()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (ITERS - 1))
    return best * 1e3


def bottleneck_bf16(x, w1, w2, w3):
    """expand 1x1 + relu6 -> dw 3x3 + relu6 -> project 1x1, all bf16."""
    y = jax.lax.conv_general_dilated(
        x, w1, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jnp.clip(y, 0, 6).astype(jnp.bfloat16)
    y = jax.lax.conv_general_dilated(
        y, w2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=y.shape[-1],
        preferred_element_type=jnp.float32)
    y = jnp.clip(y, 0, 6).astype(jnp.bfloat16)
    y = jax.lax.conv_general_dilated(
        y, w3, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (x + y.astype(jnp.bfloat16))


def bottleneck_int8(xq, w1q, w2q, w3q, g1, g2, g3):
    """Same block, activations stored int8; scales folded into epilogues."""
    y = jax.lax.conv_general_dilated(
        xq, w1q, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    y = jnp.clip(jnp.round(jnp.clip(y * g1, 0, 6) * (127.0 / 6.0)),
                 -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        y, w2q, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=y.shape[-1],
        preferred_element_type=jnp.int32).astype(jnp.float32)
    y = jnp.clip(jnp.round(jnp.clip(y * g2, 0, 6) * (127.0 / 6.0)),
                 -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        y, w3q, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    out = xq.astype(jnp.float32) + y * g3
    return jnp.clip(jnp.round(out), -127, 127).astype(jnp.int8)


def main():
    rng = np.random.RandomState(0)
    # (H, C_in, expand) mobilenetv2_w1 hot blocks
    shapes = [(56, 24, 6), (28, 32, 6), (14, 64, 6), (14, 96, 6),
              (7, 160, 6)]
    for h, c, e in shapes:
        m = c * e
        x = jnp.asarray(rng.rand(B, h, h, c).astype(np.float32) * 2 - 1,
                        jnp.bfloat16)
        xq = jnp.asarray(rng.randint(-127, 128, (B, h, h, c)), jnp.int8)
        w1 = jnp.asarray(rng.randn(1, 1, c, m) * 0.1, jnp.bfloat16)
        w2 = jnp.asarray(rng.randn(3, 3, 1, m) * 0.1, jnp.bfloat16)
        w3 = jnp.asarray(rng.randn(1, 1, m, c) * 0.1, jnp.bfloat16)
        w1q = jnp.asarray(rng.randint(-127, 128, (1, 1, c, m)), jnp.int8)
        w2q = jnp.asarray(rng.randint(-127, 128, (3, 3, 1, m)), jnp.int8)
        w3q = jnp.asarray(rng.randint(-127, 128, (1, 1, m, c)), jnp.int8)
        g1 = jnp.asarray(rng.rand(m).astype(np.float32) * 1e-3)
        g2 = jnp.asarray(rng.rand(m).astype(np.float32) * 1e-3)
        g3 = jnp.asarray(rng.rand(c).astype(np.float32) * 1e-3)

        t_bf = timeit(bottleneck_bf16, x, w1, w2, w3)
        t_i8 = timeit(bottleneck_int8, xq, w1q, w2q, w3q, g1, g2, g3)
        print(f"{h:3d}x{h:<3d} C{c:<4d} e{e}: bf16 {t_bf:7.3f} ms   "
              f"int8 {t_i8:7.3f} ms   ({t_bf/t_i8:.2f}x)")


if __name__ == "__main__":
    main()
