"""Modulated deformable convolution v2 (torchvision ``deform_conv2d``
semantics), TPU-native.

Two formulations, identical math:

- **general** (`_deform_general`): every kernel tap bilinearly sampled
  at its offset position (4 vectorized gathers), modulated by the mask,
  one (K*K*C_in, C_out) MXU matmul. Works for arbitrary offsets —
  but costs 4*K2*G gather indices per pixel, and TPU gathers pay
  per-index: measured ~25 ms per recurrence step in the ProPainter
  feat-prop module (the pipeline's dominant cost).

- **bounded-offset patch path** (`_deform_patch`): the zoo's only users
  (flow-guided alignment, propainter_rfc.py:58) produce
  ``offset = center(pixel) + residual`` with ``|residual| <=
  max_residue_magnitude`` (tanh-capped) — so all K2*G samples of a
  pixel live inside a (P, P) window around ``pixel + center``. Gather
  ONE (P, P, C) patch per pixel (K2*G*4 -> 1 index reduction), then
  evaluate every bilinear sample as two banded one-hot matmuls over
  the patch (lerp weights folded in; out-of-range taps match nothing =
  torchvision's OOB-zero). Callers opt in by passing ``center``
  (B, Ho, Wo, 2) (y, x) and ``residue_bound``.

  MEASURED (v5e, 2026-08-18) and NOT made the default: at the ProPainter
  feat-prop shapes (60x108, C=128, G=16, mag=3 -> P=10) the transformer
  window ran 980 ms vs 737 ms with the general path — per-pixel patches
  total 330 MB/step of HBM traffic, trading the gather-index cost away
  for more bytes. Neighboring pixels' windows overlap ~90%; sharing them
  needs a tiled Pallas kernel, not an XLA gather. Kept correct and
  tested (tests/test_propainter_parity.py fast-path equality) as the
  starting point for that kernel.

Out-of-image samples contribute zero (torchvision border behavior).

Reference usage: propainter_rfc.py:44 (SecondOrderDeformableAlignment),
propainter.py (BidirectionalPropagation) — offset layout
(B, 2*G*K*K, H, W) with (y, x) interleaved per (group, tap), mask
(B, G*K*K, H, W); here NHWC with the same channel ordering.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["deform_conv2d"]


def deform_conv2d(x, offset, mask, kernel, bias: Optional[jnp.ndarray] = None,
                  stride: int = 1, padding: int = 1,
                  deform_groups: int = 1,
                  center: Optional[jnp.ndarray] = None,
                  residue_bound: Optional[float] = None):
    """``x``: (B, H, W, C); ``offset``: (B, Ho, Wo, 2*G*K2);
    ``mask``: (B, Ho, Wo, G*K2) (post-sigmoid); ``kernel``: HWIO.
    Returns (B, Ho, Wo, O).

    ``center``/``residue_bound``: opt into the bounded-offset fast path
    (see module docstring): asserts ``offset == tile(center) + r`` with
    ``|r| <= residue_bound`` — the caller's contract, not checked."""
    if (center is not None and residue_bound is not None and stride == 1
            and kernel.shape[0] == 3 and kernel.shape[1] == 3
            and padding == 1):
        P = 2 * math.ceil(residue_bound) + 4
        if x.shape[1] >= P and x.shape[2] >= P:
            return _deform_patch(x, offset, mask, kernel, bias,
                                 deform_groups, center, residue_bound, P)
    return _deform_general(x, offset, mask, kernel, bias, stride,
                           padding, deform_groups)


def _deform_patch(x, offset, mask, kernel, bias, deform_groups, center,
                  residue_bound, P):
    b, hin, win, c = x.shape
    kh, kw, cin, cout = kernel.shape
    assert cin == c
    k2 = kh * kw
    g = deform_groups
    cg = c // g
    _, hout, wout, _ = offset.shape
    n = hout * wout

    off = offset.astype(jnp.float32).reshape(b, hout, wout, g, k2, 2)
    m = mask.reshape(b, hout, wout, g, k2)
    cy = center[..., 0].astype(jnp.float32)          # (B, Ho, Wo)
    cx = center[..., 1].astype(jnp.float32)
    pad = 1
    margin = math.ceil(residue_bound) + 1

    iy = jnp.arange(hout, dtype=jnp.float32)[None, :, None]
    ix = jnp.arange(wout, dtype=jnp.float32)[None, None, :]
    sy = jnp.clip(jnp.floor(iy + cy) - margin, 0, hin - P).astype(jnp.int32)
    sx = jnp.clip(jnp.floor(ix + cx) - margin, 0, win - P).astype(jnp.int32)

    starts = jnp.stack([sy, sx], axis=-1).reshape(b, n, 2)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    patch = jax.vmap(lambda xi, si: jax.lax.gather(
        xi, si, dn, slice_sizes=(P, P, c), mode="clip"))(x, starts)
    patch = patch.reshape(b, n, P, P, g, cg)         # (B, N, P, P, G, cg)

    ky, kx = np.meshgrid(np.arange(kh), np.arange(kw), indexing="ij")
    ky = jnp.asarray(ky.reshape(-1), jnp.float32)
    kx = jnp.asarray(kx.reshape(-1), jnp.float32)
    # absolute sample positions, then patch-relative (f32 throughout —
    # bf16 positions lose whole pixels past |x| ~ 256)
    py = (iy[..., None, None] - pad + ky + off[..., 0]) \
        - sy.astype(jnp.float32)[..., None, None]    # (B, Ho, Wo, G, K2)
    px = (ix[..., None, None] - pad + kx + off[..., 1]) \
        - sx.astype(jnp.float32)[..., None, None]

    pr = jnp.arange(P, dtype=jnp.float32)
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    fy = (py - y0)[..., None]
    fx = (px - x0)[..., None]
    wy = ((1.0 - fy) * (pr == y0[..., None]) +
          fy * (pr == y0[..., None] + 1.0)).astype(x.dtype)
    wx = ((1.0 - fx) * (pr == x0[..., None]) +
          fx * (pr == x0[..., None] + 1.0)).astype(x.dtype)
    wy = wy.reshape(b, n, g, k2, P)
    wx = wx.reshape(b, n, g, k2, P)

    rows = jnp.einsum("bngkp,bnpqgc->bngkqc", wy, patch)
    samp = jnp.einsum("bngkqc,bngkq->bngkc", rows, wx)
    samp = samp * m.reshape(b, n, g, k2)[..., None].astype(x.dtype)
    # (B, N, G, K2, cg) -> tap-major (K2, C) to match HWIO flatten
    samp = samp.transpose(0, 1, 3, 2, 4).reshape(b, hout, wout, k2 * c)
    w = kernel.reshape(k2 * c, cout)
    out = samp @ w
    if bias is not None:
        out = out + bias
    return out


def _deform_general(x, offset, mask, kernel, bias, stride, padding,
                    deform_groups):
    b, hin, win, c = x.shape
    kh, kw, cin, cout = kernel.shape
    assert cin == c
    k2 = kh * kw
    g = deform_groups
    cg = c // g
    _, hout, wout, _ = offset.shape

    off = offset.reshape(b, hout, wout, g, k2, 2)
    m = mask.reshape(b, hout, wout, g, k2)

    base_y = jnp.arange(hout, dtype=x.dtype) * stride - padding
    base_x = jnp.arange(wout, dtype=x.dtype) * stride - padding
    ky, kx = np.meshgrid(np.arange(kh), np.arange(kw), indexing="ij")
    ky = jnp.asarray(ky.reshape(-1), x.dtype)
    kx = jnp.asarray(kx.reshape(-1), x.dtype)

    # (B, Ho, Wo, G, K2) sample positions
    py = base_y[None, :, None, None, None] + ky[None, None, None, None, :] \
        + off[..., 0]
    px = base_x[None, None, :, None, None] + kx[None, None, None, None, :] \
        + off[..., 1]

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = py - y0
    wx = px - x0

    x_g = x.reshape(b, hin * win, g, cg)

    def corner(yi, xi):
        valid = (yi >= 0) & (yi < hin) & (xi >= 0) & (xi < win)
        yc = jnp.clip(yi, 0, hin - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, win - 1).astype(jnp.int32)
        flat = yc * win + xc                       # (B, Ho, Wo, G, K2)
        flat = flat.transpose(0, 1, 2, 4, 3)       # (B, Ho, Wo, K2, G)
        flat = flat.reshape(b, hout * wout * k2, g)
        v = jnp.take_along_axis(x_g, flat[..., None], axis=1)
        vmask = valid.transpose(0, 1, 2, 4, 3).reshape(
            b, hout * wout * k2, g)
        return v * vmask[..., None].astype(x.dtype)

    v00 = corner(y0, x0)
    v01 = corner(y0, x0 + 1)
    v10 = corner(y0 + 1, x0)
    v11 = corner(y0 + 1, x0 + 1)

    def wgt(a):
        return a.transpose(0, 1, 2, 4, 3).reshape(
            b, hout * wout * k2, g)[..., None]

    sampled = (v00 * wgt((1 - wy) * (1 - wx)) +
               v01 * wgt((1 - wy) * wx) +
               v10 * wgt(wy * (1 - wx)) +
               v11 * wgt(wy * wx))
    sampled = sampled * wgt(m)

    sampled = sampled.reshape(b, hout, wout, k2, c)
    w = kernel.reshape(k2 * c, cout)
    # tap-major then channel ordering must match HWIO flatten: HWIO
    # flattens (kh, kw, cin) with cin innermost — same as (k2, c) here.
    out = sampled.reshape(b, hout, wout, k2 * c) @ w
    if bias is not None:
        out = out + bias
    return out
