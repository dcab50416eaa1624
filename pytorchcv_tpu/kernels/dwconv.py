"""Fused depthwise conv + folded-BN + activation Pallas kernel.

The mobilenet-family hot loop (reference ``common/conv.py:437-545``
``dwconv_block``/``DwsConvBlock``) is depthwise conv -> BN -> act. XLA
fuses the epilogue but lowers depthwise conv itself through a generic conv
path; this kernel computes it as k*k shifted multiply-adds on the VPU with
the inference-folded BN scale/shift and the activation applied in VMEM, so
each activation tensor crosses HBM exactly once in and once out.

Grid: (batch, channel groups). Each program receives one whole padded
image plane (Pallas double-buffers the HBM->VMEM block fetch across grid
steps automatically); depthwise needs halos, which whole-image blocks
sidestep — Mosaic rejects unaligned partial-row DMAs, so slab-tiling is a
non-starter. Stride 2 is handled by parity reshapes of the loaded plane
(no strided vector loads). Images too large for the VMEM budget fall back
to the identical-math XLA path.

Training still works: the op is a ``jax.custom_vjp`` whose backward
differentiates the XLA fallback.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dwconv2d_bn_act"]

_ACTS = {
    "none": lambda x: x,
    "relu": lambda x: jnp.maximum(x, 0.0),
    "relu6": lambda x: jnp.clip(x, 0.0, 6.0),
    "hswish": lambda x: x * jnp.clip(x + 3.0, 0.0, 6.0) * (1.0 / 6.0),
    "hsigmoid": lambda x: jnp.clip(x + 3.0, 0.0, 6.0) * (1.0 / 6.0),
    "swish": lambda x: x * jax.nn.sigmoid(x),
    "sigmoid": jax.nn.sigmoid,
}

_VMEM_BUDGET = 12 * 1024 * 1024  # total VMEM footprint bound


def _xla_ref(x, w, scale, shift, stride, pad, act):
    """Identical-math XLA fallback (also the autodiff path)."""
    c = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, w[..., None, :].astype(x.dtype),
        window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    y = y * scale.astype(y.dtype) + shift.astype(y.dtype)
    return _ACTS[act](y)


_STRIP = 8  # output rows per accumulator strip (bounds f32 temporaries)


def _kernel(x_ref, w_ref, s_ref, b_ref, o_ref, *, kh, kw, stride, hout,
            wout, act):
    v = x_ref[0]                                   # (hp, wp, tc)
    hp, wp, tc = v.shape
    if stride == 2:
        vh = v.reshape(hp // 2, 2, wp, tc)
    for s0 in range(0, hout, _STRIP):
        sh = min(_STRIP, hout - s0)
        acc = jnp.zeros((sh, wout, tc), jnp.float32)
        for di in range(kh):
            if stride == 1:
                row = v[s0 + di:s0 + di + sh]
            else:
                row = vh[s0 + di // 2:s0 + di // 2 + sh, di % 2]
            if stride == 2:
                roww = row.reshape(sh, wp // 2, 2, tc)
            for dj in range(kw):
                if stride == 1:
                    sub = row[:, dj:dj + wout]
                else:
                    sub = roww[:, dj // 2:dj // 2 + wout, dj % 2]
                acc = acc + sub.astype(jnp.float32) * w_ref[di, dj].astype(
                    jnp.float32)
        out = acc * s_ref[0] + b_ref[0]
        o_ref[0, s0:s0 + sh] = _ACTS[act](out).astype(o_ref.dtype)


def _plan(h, wdt, c, kh, kw, stride, pad, itemsize):
    """Static shapes: padded plane extents, channel group, VMEM feasibility."""
    (pt, pb), (pl_, pr) = pad
    hout = (h + pt + pb - kh) // stride + 1
    wout = (wdt + pl_ + pr - kw) // stride + 1
    hp = h + pt + pb
    wp = wdt + pl_ + pr
    if stride == 2:
        hp = max(hp, 2 * ((kh - 1) // 2 + hout))
        wp = max(wp, 2 * ((kw - 1) // 2 + wout))
        hp += hp % 2
        wp += wp % 2
    # Channel groups must stay lane-aligned (128) for block slicing; odd
    # channel counts go whole-plane or fall back.
    tc = 128 if (c % 128 == 0) else c
    # 2x for Pallas' double-buffered block pipeline + f32 strip temps.
    fits = (2 * (hp * wp + hout * wout) * tc * itemsize +
            4 * _STRIP * wout * tc * 4) <= _VMEM_BUDGET
    return hout, wout, hp, wp, tc, fits


def _pallas_fwd(x, w, scale, shift, stride, pad, act, interpret):
    b, h, wdt, c = x.shape
    kh, kw, _ = w.shape
    (pt, pb), (pl_, pr) = pad
    itemsize = np.dtype(x.dtype).itemsize
    hout, wout, hp, wp, tc, fits = _plan(h, wdt, c, kh, kw, stride, pad,
                                         itemsize)
    if not fits or c % tc:
        return _xla_ref(x, w, scale, shift, stride, pad, act)
    xp = jnp.pad(x, ((0, 0), (pt, hp - h - pt), (pl_, wp - wdt - pl_),
                     (0, 0)))
    grid = (b, c // tc)
    kern = functools.partial(_kernel, kh=kh, kw=kw, stride=stride,
                             hout=hout, wout=wout, act=act)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hp, wp, tc), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, kw, tc), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hout, wout, tc),
                               lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hout, wout, c), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hout * wout * c * kh * kw,
            bytes_accessed=(b * hp * wp * c + b * hout * wout * c) *
            itemsize,
            transcendentals=0),
    )(xp, w, scale.reshape(1, -1).astype(jnp.float32),
      shift.reshape(1, -1).astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def dwconv2d_bn_act(x, w, scale, shift, stride: int = 1,
                    pad: Tuple[Tuple[int, int], Tuple[int, int]] = ((1, 1), (1, 1)),
                    act: str = "relu", use_pallas: Optional[bool] = None,
                    interpret: bool = False):
    """Depthwise conv + per-channel affine (folded BN) + activation.

    ``x``: (B, H, W, C); ``w``: (kh, kw, C); ``scale``/``shift``: (C,).
    ``pad``: per-dim (lo, hi). Dilation is not supported (no depthwise user
    in the zoo needs it on the hot path).

    ``use_pallas=None`` (auto) resolves to the XLA formulation: measured on
    v5e (tools/bench_kernels.py) XLA's depthwise path is faster at every
    zoo shape — the op is HBM-bound and XLA already single-passes it — so
    auto picks the measured winner. Pass ``use_pallas=True`` to force the
    Pallas kernel (parity-tested, kept for shapes/hardware where manual
    fusion wins).
    """
    if use_pallas is None:
        use_pallas = False
    if (use_pallas or interpret) and stride in (1, 2):
        return _pallas_fwd(x, w, scale, shift, stride, pad, act, interpret)
    return _xla_ref(x, w, scale, shift, stride, pad, act)


def _fwd(x, w, scale, shift, stride, pad, act, use_pallas, interpret):
    out = dwconv2d_bn_act(x, w, scale, shift, stride, pad, act, use_pallas,
                          interpret)
    return out, (x, w, scale, shift)


def _bwd(stride, pad, act, use_pallas, interpret, res, g):
    x, w, scale, shift = res
    _, vjp = jax.vjp(
        lambda x_, w_, s_, b_: _xla_ref(x_, w_, s_, b_, stride, pad, act),
        x, w, scale, shift)
    return vjp(g)


dwconv2d_bn_act.defvjp(_fwd, _bwd)
