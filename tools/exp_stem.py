"""Stem experiment: 7x7/s2 C_in=3 conv formulations on the real chip.

Round-1 found every tried formulation (direct bf16/int8, 2x2
space-to-depth, Pallas banded matmul) costs ~3 ms of the 17.8 ms int8
resnet50 batch-384 step — layout-bound, the quantified gap to the 25k
img/s north star. This script measures NEW formulations:

- s2d4: 4x4 space-to-depth -> the 7x7/s2 conv becomes a 3x3/s1 conv over
  (58,58,48) producing 2x2 output blocks as channels (C_out=256), then
  depth-to-space. 2.94x padded MACs (432-tap columns hold 147 real taps)
  but a fully MXU-shaped contraction (K=432 vs K=147-with-C_in-3-layout).
- im2col: explicit 3x3 patch concat of the s2d4 input -> one
  (B*56*56, 432) @ (432, 256) matmul.

Each int8 variant is bit-exactness-checked against the direct int8 conv
(identical int32 sums); bf16 variants within tolerance. Measured output
is the pipeline boundary tensor: quant(s_u1) + 3x3/s2 int8 maxpool.

Usage: python tools/exp_stem.py   (real TPU)
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
B = 384


def timeit(fn, *args):
    @functools.partial(jax.jit, static_argnums=0)
    def run_n(n, *a):
        def body(carry, i):
            def vary(x):
                if x.dtype == jnp.uint8:
                    return x ^ (i % 2).astype(jnp.uint8)
                if x.dtype == jnp.int8:
                    return (x ^ (i % 2).astype(jnp.int8))
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


# ---------------------------------------------------------------- weights

def make_consts(rng):
    k7 = rng.randn(7, 7, 3, 64).astype(np.float32) * 0.1
    s_w = np.maximum(np.abs(k7).max(axis=(0, 1, 2)), 1e-12) / 127.0
    wq = np.clip(np.round(k7 / s_w), -127, 127).astype(np.int8)
    gain = (rng.rand(64).astype(np.float32) + 0.5) * s_w
    bias = rng.randn(64).astype(np.float32) * 0.05
    return k7, wq, gain, bias


S_IMG = 2.64
S_U1 = 4.0


def quant(x, amax):
    return jnp.clip(jnp.round(x.astype(jnp.float32) * (127.0 / amax)),
                    -127, 127).astype(jnp.int8)


def maxpool_i8(xq):
    return jax.lax.reduce_window(
        xq, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


def epilogue(acc_f32, gain, bias):
    y = jnp.maximum(acc_f32 * gain + bias, 0.0)
    return maxpool_i8(quant(y, S_U1))


# ------------------------------------------------------------- formulations

def direct_int8(x, wq, gain, bias):
    xq = quant(x, S_IMG)
    acc = jax.lax.conv_general_dilated(
        xq, wq, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return epilogue(acc.astype(jnp.float32), gain * (S_IMG / 127.0), bias)


def direct_bf16(x, kf, bias_f):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), kf, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y + bias_f, 0.0)
    return maxpool_i8(quant(y, S_U1))


def _s2d4(xq):
    """(B,224,224,C) -> (B,58,58,16C), ch = (dy*4+dx)*C + c."""
    b, h, w, c = xq.shape
    xp = jnp.pad(xq, ((0, 0), (4, 4), (4, 4), (0, 0)))
    hp, wp = h + 8, w + 8
    xs = xp.reshape(b, hp // 4, 4, wp // 4, 4, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp // 4, wp // 4, 16 * c)
    return xs


def _w_s2d4(w7):
    """(7,7,3,64) -> (3,3,48,256): out ch = (oy*2+ox)*64 + o."""
    co = w7.shape[-1]
    w = np.zeros((3, 3, 48, 4 * co), w7.dtype)
    for oy in range(2):
        for ox in range(2):
            for a in range(7):
                for bb in range(7):
                    t, u = 2 * oy + a + 1, 2 * ox + bb + 1
                    jj, dy, kk, dx = t // 4, t % 4, u // 4, u % 4
                    for c in range(3):
                        w[jj, kk, (dy * 4 + dx) * 3 + c,
                          (oy * 2 + ox) * co:(oy * 2 + ox + 1) * co] = \
                            w7[a, bb, c]
    return w


def _d2s_out(yb):
    """(B,56,56,4*64) blocked -> (B,112,112,64)."""
    b = yb.shape[0]
    y = yb.reshape(b, 56, 56, 2, 2, 64)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 112, 112, 64)
    return y


def s2d4_int8(x, w48q, gain, bias):
    xq = quant(x, S_IMG)
    xs = _s2d4(xq)
    acc = jax.lax.conv_general_dilated(
        xs, w48q, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)          # (B,56,56,256)
    y = _d2s_out(acc).astype(jnp.float32)
    return epilogue(y, gain * (S_IMG / 127.0), bias)


def s2d4_bf16(x, w48f, bias_f):
    xs = _s2d4(x.astype(jnp.bfloat16))
    acc = jax.lax.conv_general_dilated(
        xs, w48f, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(_d2s_out(acc) + bias_f, 0.0)  # bias_f: (64,)
    return maxpool_i8(quant(y, S_U1))


def s2d4_im2col_int8(x, w48q_flat, gain, bias):
    xq = quant(x, S_IMG)
    xs = _s2d4(xq)                                  # (B,58,58,48)
    cols = jnp.concatenate(
        [xs[:, jj:jj + 56, kk:kk + 56, :]
         for jj in range(3) for kk in range(3)], axis=-1)  # (B,56,56,432)
    acc = jax.lax.dot_general(
        cols.reshape(-1, 432), w48q_flat,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).reshape(x.shape[0], 56, 56, 256)
    y = _d2s_out(acc).astype(jnp.float32)
    return epilogue(y, gain * (S_IMG / 127.0), bias)


def direct_bf16_bf16in(xb, kf, bias_f):
    """Same as direct_bf16 but the input is already bf16 (pipeline form)."""
    y = jax.lax.conv_general_dilated(
        xb, kf, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y + bias_f, 0.0)
    return maxpool_i8(quant(y, S_U1))


def nchw_bf16(xp, kf, bias_f):
    """Planar (NCHW) input — free from the Pallas preprocess kernel whose
    per-channel resize matmuls produce planes natively. Lanes = W (224),
    not the degenerate C=3. Pool in NCHW; transpose the small pooled
    tensor (56x56x64 int8) at the end."""
    y = jax.lax.conv_general_dilated(
        xp, kf, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y + bias_f[None, :, None, None], 0.0)
    q = jnp.clip(jnp.round(y * (127.0 / S_U1)), -127, 127).astype(jnp.int8)
    p = jax.lax.reduce_window(
        q, jnp.int8(-128), jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        [(0, 0), (0, 0), (1, 1), (1, 1)])
    return p.transpose(0, 2, 3, 1)


def s2d2_int8(x, w12q, gain, bias):
    """Round-1 baseline: 2x2 s2d -> 4x4/s1 conv, C_in=12."""
    xq = quant(x, S_IMG)
    b, h, w, c = xq.shape
    xp = jnp.pad(xq, ((0, 0), (2, 2), (2, 2), (0, 0)))
    hp, wp = h + 4, w + 4
    xs = xp.reshape(b, hp // 2, 2, wp // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 5, 2, 4).reshape(b, hp // 2, wp // 2, c * 4)
    acc = jax.lax.conv_general_dilated(
        xs, w12q, (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return epilogue(acc.astype(jnp.float32), gain * (S_IMG / 127.0), bias)


def _phase_pool(q256):
    """3x3/s2 pad-1 maxpool computed in s2d2-output (phase) space.

    ``q256``: (B,56,56,256) int8, channel order (p*2+q)*64+o where (p,q)
    is the output-pixel phase — i.e. plane Ypq[i,j,o] = U[2i+p,2j+q,o]
    of the (112,112,64) pre-pool tensor U. Pool rows 2m-1..2m+1 map to
    (m-1,p=1),(m,0),(m,1); cols likewise, so the pooled (56,56,64)
    result is a max of 6 shifted plane terms — pure VPU, no d2s
    transpose ever materializes the 112x112 layout."""
    neg = jnp.int8(-128)
    pl = [q256[..., k * 64:(k + 1) * 64] for k in range(4)]
    y00, y01, y10, y11 = pl

    def shift_col(a):          # a[m, n-1] viewed at n
        return jnp.pad(a, ((0, 0), (0, 0), (1, 0), (0, 0)),
                       constant_values=neg)[:, :, :-1, :]

    def shift_row(a):          # a[m-1, n] viewed at m
        return jnp.pad(a, ((0, 0), (1, 0), (0, 0), (0, 0)),
                       constant_values=neg)[:, :-1, :, :]

    a = jnp.maximum(jnp.maximum(y00, y01), shift_col(y01))
    b = jnp.maximum(jnp.maximum(y10, y11), shift_col(y11))
    return jnp.maximum(jnp.maximum(a, b), shift_row(b))


def s2d4_pre_int8(xs, w48q, gain, bias):
    """s2d4 with the packing done OUTSIDE the timed region — the pipeline
    form where the Pallas preprocess kernel emits (58,58,48) int8
    directly (it writes per-pixel anyway, the layout is free). Conv is a
    dense MXU-shaped 3x3/s1 K=432 contraction; pooling stays in phase
    space so no relayout ever happens."""
    acc = jax.lax.conv_general_dilated(
        xs, w48q, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)          # (B,56,56,256)
    g4 = jnp.tile(gain * (S_IMG / 127.0), 4)
    b4 = jnp.tile(bias, 4)
    y = jnp.maximum(acc.astype(jnp.float32) * g4 + b4, 0.0)
    return _phase_pool(quant(y, S_U1))


def s2d4_pre_bf16(xsb, w48f, bias):
    """Same pipeline form, bf16 tap matrix (no input quantization)."""
    acc = jax.lax.conv_general_dilated(
        xsb, w48f, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(acc + jnp.tile(bias, 4), 0.0)
    return _phase_pool(quant(y, S_U1))


def main():
    rng = np.random.RandomState(0)
    k7, wq, gain, bias = make_consts(rng)
    x = jnp.asarray(rng.rand(B, 224, 224, 3).astype(np.float32) * 5 - 2.5)

    # Folded bf16 kernel matching the int8 dequant math (wq * gain), so
    # bf16 vs int8 parity differs only by input-quantization error.
    kf = jnp.asarray(wq.astype(np.float32) * gain, jnp.bfloat16)
    bias_j = jnp.asarray(bias)
    gain_j = jnp.asarray(gain)
    wq_j = jnp.asarray(wq)

    w48q = jnp.asarray(_w_s2d4(wq))
    # im2col column order matches the concat order (jj,kk major):
    w48q_flat = jnp.asarray(_w_s2d4(wq).reshape(9 * 48, 256))
    w48f = jnp.asarray(_w_s2d4(wq).astype(np.float32) * np.tile(gain, 4),
                       jnp.bfloat16)

    # s2d2 weights (matches quant/resnet_int8._space_to_depth_stem layout)
    wp8 = np.pad(wq, ((1, 0), (1, 0), (0, 0), (0, 0)))
    ws2 = wp8.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 4, 1, 3, 5)
    w12q = jnp.asarray(ws2.reshape(4, 4, 12, 64))

    xb = x.astype(jnp.bfloat16)
    xp = jnp.asarray(np.transpose(np.asarray(x, np.float32),
                                  (0, 3, 1, 2)), jnp.bfloat16)
    variants = {
        "direct_int8": (direct_int8, (x, wq_j, gain_j, bias_j)),
        "direct_bf16": (direct_bf16, (x, kf, bias_j)),
        "direct_bf16_bf16in": (direct_bf16_bf16in, (xb, kf, bias_j)),
        "nchw_bf16": (nchw_bf16, (xp, kf, bias_j)),
        "s2d2_int8": (s2d2_int8, (x, w12q, gain_j, bias_j)),
        "s2d4_int8": (s2d4_int8, (x, w48q, gain_j, bias_j)),
        "s2d4_bf16": (s2d4_bf16, (x, w48f, bias_j)),
        "s2d4_im2col_int8": (s2d4_im2col_int8, (x, w48q_flat, gain_j,
                                                bias_j)),
    }

    xs_pre = jax.jit(lambda v: _s2d4(quant(v, S_IMG)))(x)
    xsb_pre = jax.jit(lambda v: _s2d4(v.astype(jnp.bfloat16)))(x)
    variants["s2d4_pre_int8"] = (s2d4_pre_int8,
                                 (xs_pre, w48q, gain_j, bias_j))
    variants["s2d4_pre_bf16"] = (s2d4_pre_bf16, (xsb_pre, w48f, bias_j))

    ref = np.asarray(jax.jit(direct_int8)(x[:8], wq_j, gain_j, bias_j))
    for name, (fn, args) in variants.items():
        small = (args[0][:8],) + args[1:]
        out = np.asarray(jax.jit(fn)(*small))
        if name.endswith("int8"):
            exact = np.array_equal(out, ref)
            tag = "bit-exact" if exact else \
                f"MISMATCH max {np.abs(out.astype(int)-ref.astype(int)).max()}"
        else:
            err = np.abs(out.astype(np.float32) -
                         ref.astype(np.float32)).max()
            tag = f"maxerr {err:.3g} (bf16 tolerance)"
        print(f"  parity {name}: {tag}")

    print(f"batch={B} timings (stem+quant+maxpool):")
    for name, (fn, args) in variants.items():
        ms = timeit(fn, *args)
        print(f"  {name:22s} {ms:7.3f} ms  "
              f"({B / ms * 1e3:8.0f} img/s stem-only)")


if __name__ == "__main__":
    main()
