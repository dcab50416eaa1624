"""Fused int8 ResNet bottleneck-unit chain (Pallas, TPU).

The int8 serving pipeline (quant/resnet_int8.py) is HBM-bound in
stages 1-2: every conv round-trips its activations through HBM, so a
stride-1 bottleneck unit moves ~3.2 MB/img (read x twice, write/read
t1/t2, write out) where the algorithm only needs 1.6 MB (read x, write
out). This kernel runs a chain of consecutive stride-1, non-downsample,
non-SE bottleneck units (reference resnet.py:254 ResUnit with
ResBottleneck body) for one image entirely in VMEM:

    for u in units:
        t1 = rq(relu(x @ W1))          # 1x1, int8 MXU
        t2 = rq(relu(conv3x3(t1)))     # 9 rolled-tap dots, see below
        x  = rq(relu(t2 @ W3 * A3 + B3 + x * R))   # 1x1 + residual

Layout: the (H, W, C) image is flattened to (H*W, C) OUTSIDE the kernel
(bit-identical XLA reshape — no relayout) and every in-kernel tensor is
2D: sublanes = flat spatial, lanes = channels. The 3x3 conv never
slices misaligned windows; tap (a, b) of the padded conv is

    dot(mask_ab * roll(t1, -((a-1)*W + (b-1)), axis=0), W2[a*3+b])

where ``mask_ab`` zeroes the rows whose rolled source wrapped past an
image row boundary (row-edge taps) or across columns (col-edge taps) —
computed from broadcasted_iota, selects only, no unaligned slicing and
no in-kernel reshapes (both are documented Mosaic failure modes, see
stem_conv.py). Requantization replays quant/resnet_int8._cell's exact
f32 op order — ``relu(acc*A + B)`` then a separate ``* (127/s_out)``
before round-half-even, and the unit tail's bf16 round-trips on both
the conv3 term and the identity term (resnet_int8.py:320-346) — so the
kernel is BIT-exact against the XLA pipeline segment it replaces
(folding the two scale multiplies into one is algebraically equal but
drifts ~1% of elements by +/-1 per unit, amplifying down the chain).

MEASURED (v5e, batch 384, random stage-shaped chains) — KEPT UNWIRED:

    stage2 (28x28, C512, M128, 3 units): XLA 2.40 ms, kernel 3.7-4.4 ms
    stage3 (14x14, C1024, M256, 5 units): XLA 2.65 ms, kernel 4.11 ms
    stage1 (56x56, C256, M64, 2 units):  Mosaic compiler crash (the f32
        tail temporaries at (3136, 256) overflow ~16 MB VMEM)

Variant ablation (stage2): no-roll-no-mask floor 3.04 ms, rolls +0.5,
masks +0.9, 4-img blocks -0.7. The floor alone loses to XLA: Mosaic
reaches ~43% MXU on the per-image int8 dots with interleaved VPU
epilogues, while the unfused XLA segment already runs at 88% of its
HBM-traffic roof — there is no fused-chain win on v5e. (Also measured:
pltpu.roll on 8-bit or bf16 values crashes the Mosaic compiler; rolls
must widen to i32.) Kept as a bit-exact documented experiment with the
interpret-mode parity test; revisit only if Mosaic's small-dot pipeline
improves.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_bottleneck_chain", "pack_units", "fused_chain_xla_ref"]


def _requant(acc_i32, a_vec, b_vec, q_scal):
    """_cell's int8 path: clip(round(max(acc*A + B, 0) * Q))."""
    y = jnp.maximum(acc_i32.astype(jnp.float32) * a_vec + b_vec, 0.0)
    return jnp.clip(jnp.round(y * q_scal), -127.0, 127.0).astype(jnp.int8)


def _kernel(h, w, n_units,
            x_ref, w1_ref, w2_ref, w3_ref,
            a1_ref, b1_ref, a2_ref, b2_ref, a3_ref, b3_ref,
            q_ref, r_ref, out_ref):
    hw = h * w
    xq = x_ref[0]                                   # (HW, C) int8
    # flat row index -> (i, j); tap validity masks are row-indexed only.
    p = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0)
    pi, pj = p // w, p % w

    for u in range(n_units):
        acc1 = jnp.dot(xq, w1_ref[u],
                       preferred_element_type=jnp.int32)
        t1 = _requant(acc1, a1_ref[u], b1_ref[u], q_ref[u, 0, 0])  # (HW, M)

        # pltpu.roll on 8-bit values crashes the Mosaic compiler (measured
        # here, v5e); widen to i32 for the roll, mask, narrow for the MXU.
        t1w = t1.astype(jnp.int32)
        acc2 = jnp.zeros((hw, t1.shape[1]), jnp.int32)
        for a in range(3):
            for b in range(3):
                delta = (a - 1) * w + (b - 1)
                rolled = (pltpu.roll(t1w, (-delta) % hw, axis=0)
                          if delta else t1w)
                valid = ((pi + (a - 1) >= 0) & (pi + (a - 1) < h) &
                         (pj + (b - 1) >= 0) & (pj + (b - 1) < w))
                tap = jnp.where(valid, rolled, 0).astype(jnp.int8)
                acc2 = acc2 + jnp.dot(tap, w2_ref[u, a * 3 + b],
                                      preferred_element_type=jnp.int32)
        t2 = _requant(acc2, a2_ref[u], b2_ref[u], q_ref[u, 0, 1])

        acc3 = jnp.dot(t2, w3_ref[u],
                       preferred_element_type=jnp.int32)
        # Unit tail (resnet_int8.py:320-346): conv3 cell emits bf16, the
        # identity term is cast to bf16, the add+ReLU run in f32, then
        # _quant to the next unit's input scale. Replayed bit-for-bit.
        t3 = (acc3.astype(jnp.float32) * a3_ref[u] + b3_ref[u]
              ).astype(jnp.bfloat16).astype(jnp.float32)
        idf = (xq.astype(jnp.float32) * r_ref[u]
               ).astype(jnp.bfloat16).astype(jnp.float32)
        y = jnp.maximum(t3 + idf, 0.0)
        xq = jnp.clip(jnp.round(y * q_ref[u, 0, 2]),
                      -127.0, 127.0).astype(jnp.int8)

    out_ref[0] = xq


def pack_units(units: Sequence[dict], s_chain: Sequence[float]):
    """Fold per-unit cell consts into the kernel's stacked operands.

    ``units``: [{'conv1': {wq, gain, bias}, 'conv2': ..., 'conv3': ...}]
    (quant/resnet_int8._cell_consts trees for a run of stride-1 units).
    ``s_chain``: [s_in, s2_0, s3_0, s_out_0(=s_in_1), s2_1, ...] — the
    activation amax chain: for unit u the scales are
    (s_in_u, s2_u, s3_u, s_out_u) with s_in_{u+1} = s_out_u.
    """
    f32 = np.float32
    w1s, w2s, w3s = [], [], []
    a1s, b1s, a2s, b2s, a3s, b3s, qs, rs = ([] for _ in range(8))
    for u, cell in enumerate(units):
        s_in, s2, s3, s_out = (s_chain[3 * u], s_chain[3 * u + 1],
                               s_chain[3 * u + 2], s_chain[3 * u + 3])
        c1, c2, c3 = cell["conv1"], cell["conv2"], cell["conv3"]
        w1s.append(np.asarray(c1["wq"])[0, 0])          # (C, M)
        k2 = np.asarray(c2["wq"])                        # (3,3,M,M) HWIO
        w2s.append(k2.reshape(9, *k2.shape[2:]))
        w3s.append(np.asarray(c3["wq"])[0, 0])          # (M, C)
        # Mirror _cell's f32 op order exactly: A = gain * f32(s_in/127)
        # (the scalar is rounded to f32 before the vector multiply, as
        # JAX weak-type promotion does), B = bias untouched, and the
        # 127/s_out quant factor kept as its own scalar multiply.
        a1s.append(np.asarray(c1["gain"], f32) * f32(s_in / 127.0))
        b1s.append(np.asarray(c1["bias"], f32))
        a2s.append(np.asarray(c2["gain"], f32) * f32(s2 / 127.0))
        b2s.append(np.asarray(c2["bias"], f32))
        a3s.append(np.asarray(c3["gain"], f32) * f32(s3 / 127.0))
        b3s.append(np.asarray(c3["bias"], f32))
        qs.append([f32(127.0 / s2), f32(127.0 / s3), f32(127.0 / s_out)])
        rs.append(np.full((1,), f32(s_in / 127.0), f32))
    return (jnp.asarray(np.stack(w1s)), jnp.asarray(np.stack(w2s)),
            jnp.asarray(np.stack(w3s)),
            jnp.asarray(np.stack(a1s)[:, None, :], f32),
            jnp.asarray(np.stack(b1s)[:, None, :], f32),
            jnp.asarray(np.stack(a2s)[:, None, :], f32),
            jnp.asarray(np.stack(b2s)[:, None, :], f32),
            jnp.asarray(np.stack(a3s)[:, None, :], f32),
            jnp.asarray(np.stack(b3s)[:, None, :], f32),
            jnp.asarray(np.stack(qs)[:, None, :], f32),
            jnp.asarray(np.stack(rs)[:, :, None], f32))


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "interpret"))
def fused_bottleneck_chain(xq, packed, h: int, w: int,
                           interpret: bool = False):
    """Run the packed unit chain over ``xq`` (B, H, W, C) int8 -> int8."""
    bsz, _, _, c = xq.shape
    (w1, w2, w3, a1, b1, a2, b2, a3, b3, q, r) = packed
    n_units, _, m = w1.shape
    hw = h * w
    x2 = xq.reshape(bsz, hw, c)
    const = lambda i: (0,) * 3
    vec = lambda i: (0, 0, 0)
    out = pl.pallas_call(
        functools.partial(_kernel, h, w, n_units),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_units, c, m), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_units, 9, m, m), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_units, m, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_units, 1, m), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_units, 1, m), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_units, 1, m), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_units, 1, m), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_units, 1, c), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_units, 1, c), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_units, 1, 3), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_units, 1, 1), vec, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, hw, c), jnp.int8),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n_units * hw * (2 * c * m + 9 * m * m),
            bytes_accessed=bsz * 2 * hw * c,
            transcendentals=0),
    )(x2, w1, w2, w3, a1, b1, a2, b2, a3, b3, q, r)
    return out.reshape(bsz, h, w, c)


def fused_chain_xla_ref(xq, units, s_chain, h, w):
    """Identical-math XLA fallback: the _cell chain this kernel fuses."""
    from ..quant.resnet_int8 import _cell, _quant  # noqa: F401
    x = xq
    for u, cell in enumerate(units):
        s_in, s2, s3, s_out = (s_chain[3 * u], s_chain[3 * u + 1],
                               s_chain[3 * u + 2], s_chain[3 * u + 3])
        t = _cell(x, s_in, cell["conv1"], 1, True, s2)
        t = _cell(t, s2, cell["conv2"], 1, True, s3)
        t = _cell(t, s3, cell["conv3"], 1, False)
        idf = (x.astype(jnp.float32) * (s_in / 127.0)).astype(jnp.bfloat16)
        y = jnp.maximum(t.astype(jnp.float32) + idf.astype(jnp.float32), 0.0)
        x = _quant(y, s_out)
    return x
