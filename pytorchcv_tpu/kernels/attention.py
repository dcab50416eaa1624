"""Fused windowed multi-head attention Pallas kernel.

ProPainter's temporal-sparse transformer (reference propainter.py:315-506)
runs softmax(q k^T / sqrt(d)) v over per-window token sets (L ~ a few
hundred tokens, head_dim 128). XLA materializes the (L, Lk) attention
matrix in HBM between the two matmuls; this kernel keeps scores, softmax
and the value contraction entirely in VMEM — one HBM read per operand, one
write for the output.

Windows are independent, so the grid is simply the flattened
(batch x windows x heads) axis with one program per window-head. The op is
a ``jax.custom_vjp``: backward differentiates the identical-math XLA
formulation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_window_attention"]


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(p, v_ref[0].astype(jnp.float32),
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _attn_mask_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + m_ref[0].astype(jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(p, v_ref[0].astype(jnp.float32),
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _xla_ref(q, k, v, scale, mask):
    s = jnp.einsum("...qd,...kd->...qk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if mask is not None:
        s = s + mask.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("...qk,...kd->...qd", p,
                      v.astype(jnp.float32)).astype(q.dtype)


def _pallas(q, k, v, mask, scale, interpret):
    lead = q.shape[:-2]
    lq, d = q.shape[-2:]
    lk = k.shape[-2]
    n = 1
    for s_ in lead:
        n *= s_
    qf = q.reshape(n, lq, d)
    kf = k.reshape(n, lk, d)
    vf = v.reshape(n, lk, d)
    specs = [
        pl.BlockSpec((1, lq, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lk, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lk, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qf, kf, vf]
    if mask is not None:
        mf = jnp.broadcast_to(mask, (*lead, lq, lk)).reshape(n, lq, lk)
        specs.append(pl.BlockSpec((1, lq, lk), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM))
        args.append(mf)
        kern = functools.partial(_attn_mask_kernel, scale=scale)
    else:
        kern = functools.partial(_attn_kernel, scale=scale)
    out = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, lq, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, lq, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * n * lq * lk * d,
            bytes_accessed=4 * n * (2 * lq * d + 2 * lk * d),
            transcendentals=n * lq * lk),
    )(*args)
    return out.reshape(*lead, lq, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused(q, k, v, mask, scale, use_pallas, interpret):
    lq, d = q.shape[-2:]
    lk = k.shape[-2]
    vmem_est = 4 * (lq * lk + 2 * lq * d + 2 * lk * d)
    if (not (use_pallas or interpret)) or vmem_est > 8 * 1024 * 1024:
        return _xla_ref(q, k, v, scale, mask)
    return _pallas(q, k, v, mask, scale, interpret)


def _fused_fwd(q, k, v, mask, scale, use_pallas, interpret):
    return _fused(q, k, v, mask, scale, use_pallas, interpret), (q, k, v, mask)


def _fused_bwd(scale, use_pallas, interpret, res, g):
    q, k, v, mask = res
    _, vjp = jax.vjp(lambda q_, k_, v_, m_: _xla_ref(q_, k_, v_, scale, m_),
                     q, k, v, mask)
    return vjp(g.astype(q.dtype))


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_window_attention(q, k, v, scale: Optional[float] = None,
                           mask=None, use_pallas: Optional[bool] = None,
                           interpret: bool = False):
    """softmax(q k^T * scale + mask) v, fused per window.

    ``q``: (..., Lq, D); ``k``/``v``: (..., Lk, D); ``mask`` (optional):
    additive bias broadcastable to (..., Lq, Lk). Leading dims flatten into
    the kernel grid. Falls back to the XLA formulation off-TPU or when a
    window would not fit VMEM; backward always uses the XLA math.

    ``use_pallas=None`` (auto) resolves to the XLA formulation: at
    ProPainter's window sizes (L a few hundred) the score matrix is small
    enough that XLA's fusion already keeps it out of HBM, and the measured
    v5e times favor XLA (tools/bench_kernels.py). Force with
    ``use_pallas=True``.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if use_pallas is None:
        use_pallas = False
    if mask is not None:
        mask = jnp.broadcast_to(mask, (*q.shape[:-1], k.shape[-2]))
    return _fused(q, k, v, mask, float(scale), bool(use_pallas),
                  bool(interpret))
