"""Pallas stem kernel: 7x7/stride-2 conv over a 3-channel image.

The classification stem is the one layer XLA leaves on the table: with
C_in=3 every XLA formulation measured ~3 ms of the 17.8 ms int8-resnet50
batch-384 step on v5e (direct int8/bf16, space-to-depth, folded variants
all equal — layout-bound). This kernel reformulates the conv as banded
matmuls that fit Mosaic's layout rules (a first attempt at in-VMEM im2col
died on "unsupported shape cast": Mosaic cannot split the minor/lane dim
of a value):

- the padded image is viewed as flat rows (H, W*3) — a free reshape —
  and split into even/odd row planes outside the kernel, so selecting
  input row 2i+a is a plain sublane-dim slice of the right parity plane;
- output columns are processed in 7 blocks of 16: block jb covers source
  lanes [96*jb, 96*jb+128), a static-width lane slice, and because the
  in-block tap offset m = 6*j' + 3*b + c is independent of jb, ONE
  (128, 1024) weight matrix serves every block:
      W2[a, 6*j' + 3*b + c, j'*64 + o] = K7[a, b, c, o]
  (zero elsewhere — 6x padded MACs, but the MXU runs them at M=112);
- 7 taps x 7 blocks = 49 int8 (112,128)x(128,1024) dots accumulate in
  int32; the epilogue folds BN gain/bias (pre-tiled per lane), ReLU and
  int8 requantization; the (112, 7168) output reshapes to
  (112, 112, 64) for free outside.

HBM traffic: image read once (int8), output written once (int8).

MEASURED (v5e, batch 384): this kernel compiles, is bit-exact against the
int8 XLA chain on the real chip, and runs ~6.5 ms total — of which the
XLA-side quant/rearrange pass is ~2.3 ms — versus ~3.0 ms for XLA's own
conv. Two optimizations that would close the gap both hit current Mosaic
limits: fusing quantization into the kernel (compile hang on the bf16
plane quant) and lane-concatenating taps into one K=896 dot (compile
error). Kept unwired: the design, exactness test, and measurements are
the starting point for a future Mosaic version; the serving pipelines
use the XLA stem.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["stem_conv7x7_s2", "prepare_stem"]

_JB = 16          # output columns per block
_LANES = 128      # source lanes per block (covers m < 6*16 + 21 = 117)


def _weight_matrix(k7: np.ndarray) -> np.ndarray:
    """(7,7,3,O) -> (7, 128, 16*O) banded tap matrix (f32)."""
    kh, kw, ci, o = k7.shape
    w2 = np.zeros((kh, _LANES, _JB * o), np.float32)
    for jp in range(_JB):
        for b in range(kw):
            for c in range(ci):
                w2[:, 6 * jp + 3 * b + c, jp * o:(jp + 1) * o] = k7[:, b, c]
    return w2


def prepare_stem(k7, gain, bias, s_img: float, s_out: float):
    """Quantize the banded weight matrix and pre-tile the epilogue.

    ``gain``/``bias``: folded-BN per-channel affine (O,). Returns
    (wq2 int8 (7,128,16*O), gain_l (1,16*O), bias_l (1,16*O)) with the
    input dequant scale folded in.
    """
    k7 = np.asarray(k7, np.float32)
    o = k7.shape[-1]
    s_w = np.maximum(np.abs(k7).max(axis=(0, 1, 2)), 1e-12) / 127.0
    w2 = _weight_matrix(k7 / s_w)            # scale per output channel
    wq2 = np.clip(np.round(w2), -127, 127).astype(np.int8)
    g = np.asarray(gain, np.float32) * s_w * (s_img / 127.0)
    b = np.asarray(bias, np.float32)
    gain_l = np.tile(g, _JB)[None]
    bias_l = np.tile(b, _JB)[None]
    return jnp.asarray(wq2), jnp.asarray(gain_l), jnp.asarray(bias_l)


def _kernel(ve_ref, vo_ref, w_ref, g_ref, b_ref, o_ref, *, hout, s_out,
            nblocks, o_ch):
    for jb in range(nblocks):
        # 7 accumulated K=128 dots per block (a lane-concat into one
        # K=896 dot fails Mosaic compile; per-tap dots lower cleanly).
        acc = jnp.zeros((hout, _JB * o_ch), jnp.int32)
        for a in range(7):
            plane = ve_ref if a % 2 == 0 else vo_ref
            rows = plane[0, a // 2:a // 2 + hout,
                         jb * _LANES:(jb + 1) * _LANES]
            acc = acc + jax.lax.dot_general(
                rows, w_ref[0, a * _LANES:(a + 1) * _LANES],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * g_ref[0] + b_ref[0]
        y = jnp.maximum(y, 0.0)
        y = jnp.clip(jnp.round(y * (127.0 / s_out)), -127, 127)
        o_ref[0, :, jb * _JB * o_ch:(jb + 1) * _JB * o_ch] = \
            y.astype(jnp.int8)


def stem_conv7x7_s2(x, k7, gain, bias, s_img: float, s_out: float,
                    interpret: bool = False):
    """int8-out stem: x (B, H, W, 3) float -> (B, H/2, W/2, O) int8
    quantized at amax ``s_out``. Implements torch
    Conv2d(3, O, 7, stride=2, padding=3) + per-channel affine + ReLU +
    symmetric int8 quantization, with the input quantized at amax
    ``s_img``.
    """
    b, h, w, c = x.shape
    assert c == 3 and h % 2 == 0 and w % 2 == 0
    hout, wout = h // 2, w // 2
    o = k7.shape[-1]
    nblocks = -(-wout // _JB)
    assert wout % _JB == 0, "wout must be a multiple of 16"

    # quantize on the flat (H, W*3) layout (696 lanes — fast elementwise),
    # pad: 3 rows/cols each side (torch pad 3) + right lanes so block
    # nblocks-1 can read 128 lanes from offset 96*(nblocks-1).
    lanes_needed = 6 * _JB * (nblocks - 1) + _LANES
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    hp = h + 6
    flat = xp.reshape(b, hp, (w + 6) * 3)
    if flat.shape[-1] < lanes_needed:
        flat = jnp.pad(flat, ((0, 0), (0, 0),
                              (0, lanes_needed - flat.shape[-1])))
    xq = jnp.clip(jnp.round(flat.astype(jnp.float32) * (127.0 / s_img)),
                  -127, 127).astype(jnp.int8)
    # Rearrange the 7 column blocks so in-kernel lane slices are
    # 128-aligned, and split rows by parity so tap row selection is a
    # plain sublane slice. (This XLA pass alone measures ~2.3 ms at
    # batch 384 — see the honest account in the module docstring.)
    xq = jnp.concatenate(
        [xq[:, :, jb * 6 * _JB:jb * 6 * _JB + _LANES]
         for jb in range(nblocks)], axis=-1)   # (B, hp, nblocks*128)
    ve = xq[:, 0::2]                          # (B, hp/2, nblocks*128)
    vo = xq[:, 1::2]
    # row 2i+a (padded coords) -> parity plane a%2, row i + a//2;
    # max row index hout-1 + 3 = hp/2 - 1  ✓
    wq2, gain_l, bias_l = prepare_stem(k7, gain, bias, s_img, s_out)
    w3 = wq2.reshape(1, 7 * _LANES, _JB * o)   # a-major stacked taps

    nr = ve.shape[1]
    lanes = ve.shape[2]
    out = pl.pallas_call(
        functools.partial(_kernel, hout=hout, s_out=s_out,
                          nblocks=nblocks, o_ch=o),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, nr, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nr, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 7 * _LANES, _JB * o), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _JB * o), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _JB * o), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hout, wout * o), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hout, wout * o), jnp.int8),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 7 * nblocks * hout * _LANES * _JB * o,
            bytes_accessed=b * (2 * nr * lanes + hout * wout * o),
            transcendentals=0),
    )(ve, vo, w3, gain_l, bias_l)
    return out.reshape(b, hout, wout, o)
