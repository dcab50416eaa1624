"""Downsampling-unit read traffic: stride-2 1x1 convs vs explicit subsample.

resnet50 (conv1_stride=True) strides at the 1x1s: in each downsampling
unit BOTH conv1 and identity_conv read the full-resolution int8 input
with window_strides=(2,2). A 1x1/s2 conv only ever touches the even
pixels, so it is bit-exact to subsample once (x[:, ::2, ::2]) and run
both convs at stride 1 — turning two strided full-res reads (HBM bursts
fetch the skipped pixels anyway) into one strided read + two dense
half-res reads. Variants:

- strided2x:   shipped path (two 1x1/s2 convs on the full-res tensor)
- presub:      x2 = x[:, ::2, ::2]; two 1x1/s1 convs on x2
- presub_prod: the subsample expressed on the PRODUCER side (epilogue of
               the previous unit writes xq and xq[::2] as two outputs),
               approximated here by timing the two convs on an
               already-materialized x2 + the producer's extra write.

Measured on stage2-unit1 geometry (56x56x256 -> 28x28, conv1 256->128,
identity 256->512), batch 384.

Usage: python tools/exp_downsample.py   (real TPU)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B = 384
H = 56
CIN = 256
MID = 128
COUT = 512
ITERS = 30


def timeit(fn, *args):
    @functools.partial(jax.jit, static_argnums=0)
    def run_n(n, *a):
        def body(carry, i):
            def vary(x):
                if x.dtype == jnp.int8:
                    return x ^ (i % 2).astype(jnp.int8)
                return x + i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype)
            out = fn(*jax.tree_util.tree_map(vary, a))
            leaves = jax.tree_util.tree_leaves(out)
            return carry + sum(l.astype(jnp.float32).sum() for l in leaves), None
        carry, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                jnp.arange(n))
        return carry

    float(run_n(1, *args))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(run_n(ITERS, *args))
        t1 = time.time()
        best = min(best, (t1 - t0) / ITERS)
    return best * 1e3


def conv1x1(xq, wq, stride):
    return jax.lax.conv_general_dilated(
        xq, wq, window_strides=(stride, stride), padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def main():
    rng = np.random.RandomState(0)
    xq = jnp.asarray(rng.randint(-127, 128, (B, H, H, CIN)), jnp.int8)
    w1 = jnp.asarray(rng.randint(-127, 128, (1, 1, CIN, MID)), jnp.int8)
    wi = jnp.asarray(rng.randint(-127, 128, (1, 1, CIN, COUT)), jnp.int8)

    def strided2x(xq, w1, wi):
        return conv1x1(xq, w1, 2), conv1x1(xq, wi, 2)

    def presub(xq, w1, wi):
        x2 = xq[:, ::2, ::2, :]
        return conv1x1(x2, w1, 1), conv1x1(x2, wi, 1)

    # exactness
    a = jax.jit(strided2x)(xq, w1, wi)
    b = jax.jit(presub)(xq, w1, wi)
    for u, v in zip(a, b):
        assert jnp.array_equal(u, v), "presub not bit-exact!"
    print("presub bit-exact vs strided ✓")

    x2 = jnp.asarray(np.asarray(b[0])[..., :0], jnp.int8)  # unused
    x2m = jnp.asarray(rng.randint(-127, 128, (B, H // 2, H // 2, CIN)),
                      jnp.int8)

    def convs_on_sub(x2, w1, wi):
        return conv1x1(x2, w1, 1), conv1x1(x2, wi, 1)

    def sub_only(xq):
        return xq[:, ::2, ::2, :]

    print(f"-- timings (ms, batch {B}, {H}x{H}x{CIN} int8 in) --")
    print(f"strided 1x1/s2 pair:        {timeit(strided2x, xq, w1, wi):7.3f}")
    print(f"presub + 1x1/s1 pair:       {timeit(presub, xq, w1, wi):7.3f}")
    print(f"  subsample alone:          {timeit(sub_only, xq):7.3f}")
    print(f"  conv pair on half-res:    {timeit(convs_on_sub, x2m, w1, wi):7.3f}")


if __name__ == "__main__":
    main()
