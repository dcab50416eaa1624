"""Flash (online-softmax) attention Pallas kernel for long sequences.

DANet's position-attention head (reference danet.py:44; ours
models/danet.py PosAttBlock) runs softmax(q k^T) v over L = H*W tokens —
3600 at the 480x480 Cityscapes protocol — so XLA must materialize an
(L, L) f32 score matrix (~51 MB per image) in HBM between the two
matmuls. This kernel streams K/V tiles through VMEM with the standard
running-max/running-sum rescaling, so scores never leave the chip: HBM
traffic drops from O(L^2) to O(L*d).

Grid: (batch, q-tiles, k-tiles), k innermost; the TPU grid is sequential,
so VMEM scratch (accumulator, running max/sum) carries state across the
k-tile steps of one q-tile.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

_NEG = -1e30


def _kernel(q_ref, k_ref, v_ref, o_ref, acc, m_ref, l_ref, *, scale,
            nk):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if scale != 1.0:
        s = s * scale
    m_prev = m_ref[:]                                  # (TQ, 128)
    m_cur = jnp.max(s, axis=-1, keepdims=True)         # (TQ, 1)
    m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
    alpha = jnp.exp(m_prev - m_new)                    # (TQ, 128)
    p = jnp.exp(s - m_new[:, :1])                      # (TQ, TK)
    l_new = l_ref[:] * alpha + jnp.broadcast_to(
        jnp.sum(p, axis=-1, keepdims=True), alpha.shape)
    acc[:] = acc[:] * alpha[:, :1] + jnp.dot(
        p, v_ref[0].astype(jnp.float32),
        preferred_element_type=jnp.float32)
    m_ref[:] = m_new
    l_ref[:] = l_new

    @pl.when(j == nk - 1)
    def _():
        o_ref[0] = (acc[:] / l_ref[:, :1]).astype(o_ref.dtype)


def _pick(n, cap):
    """Largest divisor of n that is <= cap and sublane-aligned (mult of 8);
    returns None when none exists (caller falls back to XLA)."""
    for d in range(min(n, cap) // 8 * 8, 0, -8):
        if n % d == 0:
            return d
    return None


def _xla_ref(q, k, v, scale):
    from .attention import _xla_ref as _dense_attn
    return _dense_attn(q, k, v, scale, None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(q, k, v, scale: float = 1.0,
                    use_pallas: Optional[bool] = None,
                    interpret: bool = False):
    """softmax(q k^T * scale) v without materializing the score matrix.

    ``q``: (..., Lq, D); ``k``: (..., Lk, D); ``v``: (..., Lk, Dv).
    Auto-dispatch runs the Pallas kernel on TPU when L is large enough
    that the O(L^2) HBM buffer matters; XLA einsum otherwise. Backward
    uses the XLA formulation.
    """
    lq, d = q.shape[-2:]
    lk, dv = v.shape[-2] , v.shape[-1]
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu" and
                      lq * lk >= 1024 * 1024)
    if not (use_pallas or interpret):
        return _xla_ref(q, k, v, scale)

    lead = q.shape[:-2]
    n = 1
    for s_ in lead:
        n *= s_
    qf = q.reshape(n, lq, d)
    kf = k.reshape(n, lk, d)
    vf = v.reshape(n, lk, dv)
    tq = _pick(lq, 512)
    tk = _pick(lk, 512)
    if tq is None or tk is None:
        return _xla_ref(q, k, v, scale)
    grid = (n, lq // tq, lk // tk)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, nk=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, dv), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, dv), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, lq, dv), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((tq, dv), jnp.float32),
            pltpu.VMEM((tq, 128), jnp.float32),
            pltpu.VMEM((tq, 128), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * n * lq * lk * (d + dv) // 2,
            bytes_accessed=4 * n * (lq * d + lk * d + lk * dv + lq * dv),
            transcendentals=n * lq * lk),
    )(qf, kf, vf)
    return out.reshape(*lead, lq, dv)


def _fwd(q, k, v, scale, use_pallas, interpret):
    return flash_attention(q, k, v, scale, use_pallas, interpret), (q, k, v)


def _bwd(scale, use_pallas, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_ref(q_, k_, v_, scale),
                     q, k, v)
    return vjp(g.astype(q.dtype))


flash_attention.defvjp(_fwd, _bwd)
