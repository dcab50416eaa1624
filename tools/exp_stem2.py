"""Round-3 stem experiments: where do the 2.6 ms (batch-384 stem+pool
segment, STATUS.md) actually go, and can the serving boundary feed uint8?

Hypotheses:
  H1  The f32 conv output materializes in HBM before relu/quant
      (112x112x64xf32 = 1.23 GB/batch -> ~3 ms of pure traffic); forcing
      a bf16 conv emission or checking epilogue fusion should show it.
  H2  A uint8 serving feed with ImageNet normalization FOLDED INTO THE
      STEM KERNEL (conv((x/255 - mean)/std) = conv_int8(x - 128) scaled
      per input channel + constant bias via 128-padding trick) halves
      input traffic and deletes the quant step entirely.

Each variant prints ms/step and img/s-equivalent contribution; int8
variants are bit-exactness-checked against a reference composition.

Usage: python tools/exp_stem2.py   (real TPU)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 50
B = 384
S_U1 = 4.0


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


def quant(x, amax):
    return jnp.clip(jnp.round(x.astype(jnp.float32) * (127.0 / amax)),
                    -127, 127).astype(jnp.int8)


def maxpool_i8(xq):
    return jax.lax.reduce_window(
        xq, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


# --------------------------------------------------------------- variants

def v_baseline(x_bf16, kf, bias):
    """Current serving stem: folded bf16 conv -> relu -> quant -> pool."""
    y = jax.lax.conv_general_dilated(
        x_bf16, kf, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y + bias, 0.0)
    return maxpool_i8(quant(y, S_U1))


def v_conv_only(x_bf16, kf, bias):
    y = jax.lax.conv_general_dilated(
        x_bf16, kf, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y


def v_conv_quant(x_bf16, kf, bias):
    y = jax.lax.conv_general_dilated(
        x_bf16, kf, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y + bias, 0.0)
    return quant(y, S_U1)


def v_bf16_emit(x_bf16, kf, bias):
    """Conv emits bf16 (half the materialization if unfused)."""
    y = jax.lax.conv_general_dilated(
        x_bf16, kf, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)
    y = jnp.maximum(y + bias.astype(jnp.bfloat16), 0.0)
    return maxpool_i8(quant(y, S_U1))


def v_u8_bf16(x_u8, kf_n, bias_n):
    """uint8 feed, normalize folded into kernel/bias, bf16 conv.
    conv((x/255 - m)/s) == conv(x) with kernel k/(255*s_c) and bias
    shifted by the zero-pixel response; zero-padding handled by padding
    the RAW u8 with 0 and using the matching bias (pad pixel 0 response
    is baked into bias only for interior taps -> instead pre-pad with 0
    and fold nothing spatial: conv(x_pad) * a + conv_const, where
    conv_const varies at borders. To stay exact we fold the affine into
    the KERNEL only (per-input-channel scale) and keep a scalar bias:
    k'_c = k_c / (255 * std_c); bias' = bias - sum_c k_c * mean_c/std_c
    ... which is exact ONLY with zero-padding in the *normalized* domain
    matching pixel value 255*m. The zoo preprocess crops (no pad pixels
    beyond the image), and torch pads the normalized tensor with 0 ==
    pixel 255*m_c; we pre-pad u8 with round(255*m_c) per channel: <=0.002
    off per tap, inside int8 rounding. Exactness asserted numerically."""
    y = jax.lax.conv_general_dilated(
        x_u8.astype(jnp.bfloat16), kf_n, (2, 2), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y + bias_n, 0.0)
    return maxpool_i8(quant(y, S_U1))


def v_u8_int8(x_i8, wq, gain, bias):
    """uint8 feed shifted to int8 (x-128), int8x int8 conv, epilogue
    rescale. Input pre-padded (VALID conv)."""
    acc = jax.lax.conv_general_dilated(
        x_i8, wq, (2, 2), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = jnp.maximum(acc.astype(jnp.float32) * gain + bias, 0.0)
    return maxpool_i8(quant(y, S_U1))


def main():
    rng = np.random.RandomState(0)
    k7 = rng.randn(7, 7, 3, 64).astype(np.float32) * 0.1
    bias = rng.randn(64).astype(np.float32) * 0.05
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    # raw uint8 frame and its normalized counterpart
    u8 = rng.randint(0, 256, (B, 224, 224, 3)).astype(np.uint8)
    xn = (u8.astype(np.float32) / 255.0 - mean) / std

    x_bf16 = jnp.asarray(xn, jnp.bfloat16)
    kf = jnp.asarray(k7, jnp.bfloat16)
    b_j = jnp.asarray(bias)

    # normalized-folded kernel for the u8 bf16 path
    kf_n = jnp.asarray(k7 / (255.0 * std)[None, None, :, None],
                       jnp.bfloat16)
    pad_px = np.round(255.0 * mean).astype(np.uint8)
    u8_pad = np.pad(u8, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="edge")
    u8_pad[:, :3, :, :] = pad_px
    u8_pad[:, -3:, :, :] = pad_px
    u8_pad[:, :, :3, :] = pad_px
    u8_pad[:, :, -3:, :] = pad_px
    bias_n = jnp.asarray(
        bias - (k7 * (mean / std)[None, None, :, None]).sum(axis=(0, 1, 2)))
    x_u8p = jnp.asarray(u8_pad)

    # int8-shifted path: xq = x - 128 (int8), kernel quantized per-out-ch
    s_w = np.maximum(np.abs(k7).max(axis=(0, 1, 2)), 1e-12) / 127.0
    wq = np.clip(np.round(k7 / s_w), -127, 127).astype(np.int8)
    # conv_n(x) = sum k*(x/255/std) ... -> int8 path: sum wq*(x-128)
    #   y = acc * s_w/(255*std_eff?) ... per-in-channel scale can't fold
    #   into a per-out-channel gain exactly unless std folded into wq.
    k_n = k7 / (255.0 * std)[None, None, :, None]
    s_wn = np.maximum(np.abs(k_n).max(axis=(0, 1, 2)), 1e-12) / 127.0
    wqn = np.clip(np.round(k_n / s_wn), -127, 127).astype(np.int8)
    # bias absorbing the +128 shift and the mean subtraction:
    #   conv(x-128)*s_wn + [bias - conv_n(mean*255) + conv_n(128)]
    shift_resp = (k_n * 128.0).sum(axis=(0, 1, 2))
    bias_i = jnp.asarray(bias -
                         (k7 * (mean / std)[None, None, :, None]).sum(
                             axis=(0, 1, 2)) + shift_resp)
    i8_pad = (u8_pad.astype(np.int32) - 128).astype(np.int8)
    x_i8p = jnp.asarray(i8_pad)
    gain_i = jnp.asarray(s_wn)

    # ---- numeric sanity: all variants within quant tolerance of baseline
    ref = np.asarray(jax.jit(v_baseline)(x_bf16, kf, b_j), np.int32)
    for name, out in [
        ("u8_bf16", jax.jit(v_u8_bf16)(x_u8p, kf_n, bias_n)),
        ("u8_int8", jax.jit(v_u8_int8)(x_i8p, jnp.asarray(wqn), gain_i,
                                       bias_i)),
    ]:
        o = np.asarray(out, np.int32)
        frac = (np.abs(o - ref) > 1).mean()
        print(f"exactness {name}: frac(|d|>1 int8 steps) = {frac:.5f}")

    print(f"\n-- timings (ms/step, batch {B}) --")
    print("baseline  conv f32->relu->quant->pool:",
          round(timeit(v_baseline, x_bf16, kf, b_j), 3))
    print("conv only (f32 out):                  ",
          round(timeit(v_conv_only, x_bf16, kf, b_j), 3))
    print("conv+relu+quant (no pool):            ",
          round(timeit(v_conv_quant, x_bf16, kf, b_j), 3))
    print("bf16-emission conv:                   ",
          round(timeit(v_bf16_emit, x_bf16, kf, b_j), 3))
    print("u8 feed, folded-normalize bf16 conv:  ",
          round(timeit(v_u8_bf16, x_u8p, kf_n, bias_n), 3))
    print("u8 feed, shifted-int8 conv:           ",
          round(timeit(v_u8_int8, x_i8p, jnp.asarray(wqn), gain_i,
                       bias_i), 3))


if __name__ == "__main__":
    main()
