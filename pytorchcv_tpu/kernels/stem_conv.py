"""Pallas stem kernel: 7x7/stride-2 conv over a 3-channel image.

The classification stem is the one layer XLA leaves on the table: with
C_in=3 the conv is layout-bound (every formulation measured ~3 ms of the
17.8 ms int8-resnet50 batch-384 step on v5e — direct int8/bf16,
space-to-depth, folded variants all equal). This kernel does im2col in
VMEM instead: each program loads one padded image as flat (H, W*3) rows
(a free reshape — NHWC C-minor is row-major), assembles the 8-row strip
patch matrix by parity reshapes + lane slices entirely in VMEM, and runs
one (896, 168) x (168, 64) MXU matmul per strip with folded-BN + ReLU +
int8 requant in the epilogue. HBM traffic: image read once, int8 output
written once (~0.6 ms bound vs XLA's ~3 ms).

Weight layout: W'[di*24 + dj*3 + c, o] = K7[di, dj, c, o] zero-padded to
24 taps per kernel row (the m = 21..23 lanes multiply zero-padded image
columns — 12.5% extra MACs for clean 6-lane slicing).

STATUS: bit-exact in interpret mode (tests/test_pallas_kernels.py), but
current Mosaic cannot lower the lane->sublane reshape the in-VMEM im2col
needs ("infer-vector-layout: unsupported shape cast" on
``r.reshape(sh, wp3//6, 6)``), so the kernel does not yet compile for
real TPUs — kept as the measured-and-specified design for when Mosaic
grows the relayout (or for a future hand-written Mosaic path). The XLA
stem stays in the serving pipeline meanwhile.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["stem_conv7x7_s2"]

_STRIP = 8


def _pack_weights(k7, gain, bias):
    """(7,7,3,O), BN gain/bias -> (168, O) f32 matmul weights + bias."""
    k = jnp.asarray(k7, jnp.float32) * gain          # fold BN scale
    w = jnp.zeros((7, 24, k.shape[-1]), jnp.float32)
    w = w.at[:, :21].set(k.reshape(7, 21, -1))
    return w.reshape(168, -1), bias


def _kernel(x_ref, w_ref, b_ref, o_ref, *, hout, wout, s_out):
    v = x_ref[0]                                     # (hp, wp3) f32-able
    hp, wp3 = v.shape
    for s0 in range(0, hout, _STRIP):
        sh = min(_STRIP, hout - s0)
        # rows needed: 2*sh + 5; slab sized 2*sh+6 (even) for parity split
        rows = v[2 * s0:2 * s0 + 2 * sh + 6]
        rr = rows.reshape(sh + 3, 2, wp3)
        pieces = []
        for di in range(7):
            r = rr[di // 2: di // 2 + sh, di % 2]    # (sh, wp3)
            rw = r.reshape(sh, wp3 // 6, 6)
            for q in range(4):
                pieces.append(rw[:, q:q + wout])     # (sh, wout, 6)
        p = jnp.concatenate(pieces, axis=-1)         # (sh, wout, 168)
        p = p.reshape(sh * wout, 168).astype(jnp.float32)
        y = jnp.dot(p, w_ref[:], preferred_element_type=jnp.float32)
        y = jnp.maximum(y + b_ref[0], 0.0)
        y = jnp.clip(jnp.round(y * (127.0 / s_out)), -127, 127)
        o_ref[0, s0:s0 + sh] = y.reshape(sh, wout, -1).astype(jnp.int8)


def stem_conv7x7_s2(x, k7, gain, bias, s_out: float,
                    interpret: bool = False):
    """int8-out stem: x (B, H, W, 3) float -> (B, H/2, W/2, O) int8
    quantized at amax ``s_out``; BN folded via ``gain``/``bias`` (O,).

    Implements torch Conv2d(3, O, 7, stride=2, padding=3) + affine + ReLU
    + symmetric int8 quantization.
    """
    b, h, w, c = x.shape
    assert c == 3
    hout, wout = h // 2, w // 2
    o = k7.shape[-1]
    # pixel pad 3 (torch) + alignment: rows to cover last strip's slab
    # (2*hout+5 rows from row 0), cols so (wp*3)/6 >= wout+3 groups.
    hp = 2 * ((hout + 3) // _STRIP * _STRIP if hout % _STRIP else hout) + 6
    hp = max(hp, h + 6)
    top = 3
    wp = 2 * (wout + 4)
    xp = jnp.pad(x, ((0, 0), (top, hp - h - top), (3, wp - w - 3), (0, 0)))
    flat = xp.reshape(b, hp, wp * 3)
    wmat, bvec = _pack_weights(k7, gain, bias)

    out = pl.pallas_call(
        functools.partial(_kernel, hout=hout, wout=wout, s_out=s_out),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hp, wp * 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((168, o), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hout, wout, o), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hout, wout, o), jnp.int8),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hout * wout * 168 * o,
            bytes_accessed=b * (hp * wp * 3 * 2 + hout * wout * o),
            transcendentals=0),
    )(flat, wmat, bvec.reshape(1, -1).astype(jnp.float32))
    return out
