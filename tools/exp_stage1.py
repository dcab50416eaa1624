"""Stage-1 bottleneck-unit tail formulations (int8 resnet50 hot stage).

Per-stage truncation (exp_profile_stages.py) puts stage1 at 5.69 ms of
the 17.3 ms step vs a ~4.4 ms traffic roof (with the bf16 pre-add
tensor) and ~1.3 ms compute roof. Variants probe whether XLA fuses the
conv3 -> +identity -> ReLU -> requant chain without materializing bf16:

- cell_bf16:   shipped path (_cell writes bf16 t, separate add)
- chain_f32:   same ops, no bf16 roundtrip (single f32 expression)
- chain_into_conv: add expressed directly on the conv's int32 accum

Times THREE chained units (= stage1 shape) at batch 384.

Usage: python tools/exp_stage1.py
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
MID = 64
ITERS = 20


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


def conv_i8(xq, wq, stride=1):
    k = wq.shape[0]
    pad = [(k // 2, k // 2)] * 2
    return jax.lax.conv_general_dilated(
        xq, wq, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def make_unit(kind):
    """One non-downsample bottleneck unit: xq int8 -> xq' int8."""
    def unit(xq, w1, w2, w3, g1, g2, g3):
        a1 = conv_i8(xq, w1).astype(jnp.float32)
        m1 = jnp.clip(jnp.round(jnp.maximum(a1 * g1, 0.0)), -127,
                      127).astype(jnp.int8)
        a2 = conv_i8(m1, w2).astype(jnp.float32)
        m2 = jnp.clip(jnp.round(jnp.maximum(a2 * g2, 0.0)), -127,
                      127).astype(jnp.int8)
        a3 = conv_i8(m2, w3).astype(jnp.float32)
        if kind == "cell_bf16":
            t = (a3 * g3).astype(jnp.bfloat16)
            idf = (xq.astype(jnp.float32) * 0.01).astype(jnp.bfloat16)
            y = jnp.maximum(t.astype(jnp.float32) +
                            idf.astype(jnp.float32), 0.0)
            return jnp.clip(jnp.round(y * 0.43), -127, 127).astype(jnp.int8)
        if kind == "chain_f32":
            y = jnp.maximum(a3 * g3 + xq.astype(jnp.float32) * 0.01, 0.0)
            return jnp.clip(jnp.round(y * 0.43), -127, 127).astype(jnp.int8)
        if kind == "no_residual":
            # lower bound: what the unit costs without the identity read/add
            y = jnp.maximum(a3 * g3, 0.0)
            return jnp.clip(jnp.round(y * 0.43), -127, 127).astype(jnp.int8)
        raise ValueError(kind)

    def stage(xq, consts):
        for u in range(3):
            xq = unit(xq, *consts[u])
        return xq
    return stage


def main():
    rng = np.random.RandomState(0)
    xq = jnp.asarray(rng.randint(-127, 128, (B, H, H, CIN)), jnp.int8)
    consts = []
    for _ in range(3):
        w1 = jnp.asarray(rng.randint(-127, 128, (1, 1, CIN, MID)), jnp.int8)
        w2 = jnp.asarray(rng.randint(-127, 128, (3, 3, MID, MID)), jnp.int8)
        w3 = jnp.asarray(rng.randint(-127, 128, (1, 1, MID, CIN)), jnp.int8)
        g1 = jnp.asarray(rng.rand(MID).astype(np.float32) * 1e-4)
        g2 = jnp.asarray(rng.rand(MID).astype(np.float32) * 1e-4)
        g3 = jnp.asarray(rng.rand(CIN).astype(np.float32) * 1e-4)
        consts.append((w1, w2, w3, g1, g2, g3))

    ref = None
    for kind in ("cell_bf16", "chain_f32", "no_residual"):
        fn = make_unit(kind)
        out = np.asarray(jax.jit(fn)(xq[:4], consts))
        if ref is None:
            ref = out
        tag = "" if np.array_equal(out, ref) else "  (differs as expected)"
        ms = timeit(fn, xq, consts)
        print(f"  {kind:18s} {ms:7.3f} ms{tag}")


if __name__ == "__main__":
    main()
