"""Real-chip microbenchmarks: Pallas kernels vs their XLA fallbacks.

Timing methodology matches bench.py: wrap N invocations in a jitted
lax.scan serialized by a scalar carry (the axon tunnel's block_until_ready
does not synchronize), fetch a scalar, subtract 1-iter wall time.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pytorchcv_tpu.kernels import (dwconv2d_bn_act, fused_window_attention,
                                   preprocess_batch, resize_matrices)
from pytorchcv_tpu.kernels.dwconv import _xla_ref as dw_ref
from pytorchcv_tpu.kernels.attention import _xla_ref as attn_ref

ITERS = 20


def timeit(fn, *args):
    @functools.partial(jax.jit, static_argnums=0)
    def run_n(n, *a):
        def body(carry, i):
            # Iteration-dependent inputs so XLA can't hoist the body out
            # of the loop (uint8: xor with i&1; float: add tiny i-term).
            def vary(x):
                if x.dtype == jnp.uint8:
                    return x ^ (i % 2).astype(jnp.uint8)
                return x + (i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype))
            out = fn(*jax.tree_util.tree_map(vary, a))
            leaves = jax.tree_util.tree_leaves(out)
            return carry + leaves[0].astype(jnp.float32).sum(), None
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
    return best * 1e3  # ms


def check(name, a, b, atol=2e-2):
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                b.astype(jnp.float32))))
    status = "OK" if err <= atol else f"FAIL (maxerr {err:.4g})"
    print(f"  parity {name}: {status}")


def bench_preprocess():
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 256, (256, 256, 256, 3), np.uint8))
    r, c = resize_matrices((256, 256), 224)
    r = jnp.asarray(r); ct = jnp.asarray(c.T)
    pall = lambda im: preprocess_batch(im, r, ct, use_pallas=True)
    xla = lambda im: preprocess_batch(im, r, ct, use_pallas=False)
    check("preprocess", pall(imgs), xla(imgs))
    tp = timeit(pall, imgs); tx = timeit(xla, imgs)
    print(f"preprocess 256x(256,256)->224: pallas {tp:.3f} ms  "
          f"xla {tx:.3f} ms  ({256/tp*1e3:.0f} vs {256/tx*1e3:.0f} img/s)")


def bench_dwconv():
    rng = np.random.RandomState(1)
    for (h, c, stride, k) in [(112, 64, 1, 3), (56, 128, 1, 3),
                              (112, 96, 2, 3), (28, 576, 1, 5),
                              (14, 1152, 1, 5)]:
        x = jnp.asarray(rng.randn(32, h, h, c), jnp.bfloat16)
        w = jnp.asarray(rng.randn(k, k, c) * 0.2, jnp.float32)
        s = jnp.ones(c, jnp.float32); b = jnp.zeros(c, jnp.float32)
        pad = ((k // 2, k // 2), (k // 2, k // 2))
        pall = lambda x_: dwconv2d_bn_act(x_, w, s, b, stride, pad, "relu6",
                                          use_pallas=True)
        xla = lambda x_: dw_ref(x_, w, s, b, stride, pad, "relu6")
        check(f"dwconv h{h} c{c} s{stride} k{k}", pall(x), xla(x), atol=0.1)
        tp = timeit(pall, x); tx = timeit(xla, x)
        print(f"dwconv B32 {h}x{h}x{c} s{stride} k{k}: pallas {tp:.3f} ms  "
              f"xla {tx:.3f} ms  speedup {tx/tp:.2f}x")


def bench_flash():
    from pytorchcv_tpu.kernels import flash_attention
    from pytorchcv_tpu.kernels.flash_attention import _xla_ref as fref
    rng = np.random.RandomState(3)
    # DANet Cityscapes: B=4, L=60*60, d_qk=64, d_v=512
    q = jnp.asarray(rng.randn(4, 3600, 64), jnp.bfloat16)
    k = jnp.asarray(rng.randn(4, 3600, 64), jnp.bfloat16)
    v = jnp.asarray(rng.randn(4, 3600, 512), jnp.bfloat16)
    pall = lambda a, b, c: flash_attention(a, b, c, 1.0, use_pallas=True)
    xla = lambda a, b, c: fref(a, b, c, 1.0)
    check("flash 3600x3600", pall(q, k, v), xla(q, k, v), atol=0.1)
    tp = timeit(pall, q, k, v); tx = timeit(xla, q, k, v)
    print(f"flash-attention (4,3600,64->512): pallas {tp:.3f} ms  "
          f"xla {tx:.3f} ms  speedup {tx/tp:.2f}x")


def bench_attention():
    rng = np.random.RandomState(2)
    for (n, lq, lk, d) in [(240, 225, 450, 128), (960, 45, 45, 128)]:
        q = jnp.asarray(rng.randn(n, lq, d), jnp.bfloat16)
        k = jnp.asarray(rng.randn(n, lk, d), jnp.bfloat16)
        v = jnp.asarray(rng.randn(n, lk, d), jnp.bfloat16)
        pall = lambda q_, k_, v_: fused_window_attention(
            q_, k_, v_, use_pallas=True)
        xla = lambda q_, k_, v_: attn_ref(q_, k_, v_, d ** -0.5, None)
        check(f"attn n{n} {lq}x{lk}", pall(q, k, v), xla(q, k, v), atol=0.1)
        tp = timeit(pall, q, k, v); tx = timeit(xla, q, k, v)
        print(f"attention ({n},{lq},{lk},{d}): pallas {tp:.3f} ms  "
              f"xla {tx:.3f} ms  speedup {tx/tp:.2f}x")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    bench_preprocess()
    bench_dwconv()
    bench_attention()
    bench_flash()
