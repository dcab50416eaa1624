"""Stage-1/2 XLA emission variants for the int8 unit chain.

The per-stage profile (exp_profile_stages.py, kernel-perturbation
timing) puts stage1 ~5.5 ms vs a ~4.7 ms traffic roof and stage2
~3.7 vs ~3.2 — XLA at 85-88% of physics. Pallas fusions measured worse
(fused_bottleneck.py). This sweeps cheap emission-level choices:

  conv_cell    shipped path (_cell: lax.conv for every conv)
  dot_1x1      1x1 convs emitted as (B*H*W, C) @ (C, N) dots
  fold_scale   single fused multiply epilogue: relu(acc*(A*Q') + B*Q')
               then round/clip (NOT bit-exact: ~1% of elements +/-1)
  bf16_epi     gain/bias multiply in bf16 instead of f32 (not bit-exact)

Geometry: 3 chained stride-1 bottleneck units, stage1 shape
(56x56, C=256, M=64), batch 384. Each variant checked against conv_cell
(exact for dot_1x1; fraction of +/-1 steps reported for the others).

Usage: python tools/exp_stage_variants.py   (real TPU)
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
            return carry + out.astype(jnp.float32).sum(), None
        carry, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                jnp.arange(n))
        return carry

    float(run_n(1, *args))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(run_n(ITERS, *args))
        best = min(best, (time.time() - t0) / ITERS)
    return best * 1e3


def conv_i8(xq, wq, stride=1):
    k = wq.shape[0]
    pad = [(k // 2,) * 2] * 2
    return jax.lax.conv_general_dilated(
        xq, wq, window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def dot_1x1(xq, wq):
    b, h, w, c = xq.shape
    n = wq.shape[-1]
    y = jax.lax.dot_general(
        xq.reshape(b * h * w, c), wq.reshape(c, n),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    return y.reshape(b, h, w, n)


def make_stage(kind):
    """3 chained units; consts = per-unit (w1,w2,w3,g1,g2,g3) lists."""
    S = 4.0      # uniform activation amax (structure-preserving)
    Q = np.float32(127.0 / S)
    R = np.float32(S / 127.0)

    def requant_exact(acc, g):
        y = jnp.maximum(acc.astype(jnp.float32) * (g * R), 0.0)
        return jnp.clip(jnp.round(y * Q), -127, 127).astype(jnp.int8)

    def requant_fold(acc, g):
        y = jnp.maximum(acc.astype(jnp.float32) * (g * R * Q), 0.0)
        return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)

    def requant_bf16(acc, g):
        y = jnp.maximum(acc.astype(jnp.bfloat16) *
                        (g * R).astype(jnp.bfloat16), 0.0)
        return jnp.clip(jnp.round(y.astype(jnp.float32) * Q),
                        -127, 127).astype(jnp.int8)

    rq = {"conv_cell": requant_exact, "dot_1x1": requant_exact,
          "fold_scale": requant_fold, "bf16_epi": requant_bf16}[kind]
    c1 = dot_1x1 if kind == "dot_1x1" else (lambda x, w: conv_i8(x, w))

    def stage(xq, consts):
        for (w1, w2, w3, g1, g2, g3) in consts:
            t = rq(c1(xq, w1), g1)
            t = rq(conv_i8(t, w2), g2)
            acc3 = c1(t, w3)
            t3 = (acc3.astype(jnp.float32) * (g3 * R)).astype(jnp.bfloat16)
            idf = (xq.astype(jnp.float32) * R).astype(jnp.bfloat16)
            y = jnp.maximum(t3.astype(jnp.float32) +
                            idf.astype(jnp.float32), 0.0)
            xq = jnp.clip(jnp.round(y * Q), -127, 127).astype(jnp.int8)
        return xq
    return stage


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    rng = np.random.RandomState(0)
    xq = jnp.asarray(rng.randint(-127, 128, (B, H, H, CIN)), jnp.int8)
    consts = []
    for _ in range(3):
        consts.append((
            jnp.asarray(rng.randint(-4, 5, (1, 1, CIN, MID)), jnp.int8),
            jnp.asarray(rng.randint(-4, 5, (3, 3, MID, MID)), jnp.int8),
            jnp.asarray(rng.randint(-4, 5, (1, 1, MID, CIN)), jnp.int8),
            jnp.asarray(rng.rand(MID) * 0.02, jnp.float32),
            jnp.asarray(rng.rand(MID) * 0.02, jnp.float32),
            jnp.asarray(rng.rand(CIN) * 0.02, jnp.float32),
        ))

    ref = np.asarray(jax.jit(make_stage("conv_cell"))(xq, consts))
    print(f"-- 3-unit stage1 chain (batch {B}, {H}x{H}x{CIN}) --")
    for kind in ("conv_cell", "dot_1x1", "fold_scale", "bf16_epi"):
        fn = make_stage(kind)
        out = np.asarray(jax.jit(fn)(xq, consts))
        frac = float(np.mean(np.abs(out.astype(np.int32) -
                                    ref.astype(np.int32)) > 0))
        ms = timeit(fn, xq, consts)
        print(f"  {kind:11s} {ms:7.3f} ms   mismatch frac {frac:.5f}")


if __name__ == "__main__":
    main()
