"""Modulated deformable convolution v2 (torchvision ``deform_conv2d``
semantics), TPU-native.

Three formulations, identical math, measured dispatch (v5e, ProPainter
feat-prop shape (1,60,108,128) G=16, tools/exp_deform.py):

- **footprint** (`_deform_footprint`, default for bf16): ONE (2, 2, cg)
  footprint gather per sample instead of four corner gathers — TPU
  gathers pay per index, and this is 4x fewer indices. 18.5 ms bf16
  (vs 32.2 for 4-corner bf16); 22.1 f32. (A Pallas on-chip gather was
  probed and does NOT lower: Mosaic rejects dynamic sublane gathers,
  2026-08.)

- **general** (`_deform_general`, default for f32): every kernel tap
  bilinearly sampled at its offset position (4 vectorized gathers),
  modulated by the mask, one (K*K*C_in, C_out) MXU matmul. 19.7 ms f32.
  Also the oracle the other formulations are equality-tested against.
  Sample positions are always computed in f32: bf16 positions lose
  half-pixels past |x|~128, wrong whole pixels past 256.

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
        # Pallas window sampler (kernels/deform_patch.py): whole feature
        # map VMEM-resident, one dynamic value load per pixel. Measured
        # v5e at the feat-prop shape (1,60,108,128) G=16: 1.8 ms vs 18.5
        # footprint / 30 patch-gather (tools/exp_deform3.py). Applies to
        # b==1 TPU with the map (+ per-tile buffers) inside the ~16 MB
        # VMEM; otherwise fall through to the measured XLA defaults —
        # the XLA _deform_patch formulation stays tested but is NOT
        # dispatched (measured slower in context: module docstring).
        if (x.shape[1] >= P and x.shape[2] >= P and x.shape[0] == 1
                and jax.default_backend() == "tpu"
                and (x.shape[1] * (x.shape[2] + 32) * x.shape[3]
                     * x.dtype.itemsize) <= 8 * 2 ** 20):
            from ..kernels.deform_patch import deform_sample_patch
            sampled = deform_sample_patch(
                x, offset, mask, deform_groups, center,
                residue_bound, P)
            k2c = kernel.shape[0] * kernel.shape[1] * kernel.shape[2]
            out = sampled @ kernel.reshape(k2c, kernel.shape[3])
            if bias is not None:
                out = out + bias
            return out
    # Measured dispatch (v5e, tools/exp_deform.py, feat-prop shape):
    # bf16 -> footprint (18.5 vs 32.2 ms), f32 -> 4-corner (19.7 vs 22.1).
    if x.dtype == jnp.bfloat16:
        return _deform_footprint(x, offset, mask, kernel, bias, stride,
                                 padding, deform_groups)
    return _deform_general(x, offset, mask, kernel, bias, stride,
                           padding, deform_groups)


def _deform_footprint(x, offset, mask, kernel, bias, stride, padding,
                      deform_groups):
    """General-offset path via ONE (2, 2, cg) footprint gather per sample
    instead of four corner gathers — 4x fewer gather indices, and TPU
    gathers pay per index (measured v5e, ProPainter feat-prop shape
    (1,60,108,128) G=16: 18.4 ms bf16 / 22.1 f32 vs 32.3 / 23.6 for the
    4-corner path; tools/exp_deform.py). Identical math: out-of-image
    corners contribute zero via weight masking."""
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

    base_y = jnp.arange(hout, dtype=jnp.float32) * stride - padding
    base_x = jnp.arange(wout, dtype=jnp.float32) * stride - padding
    ky, kx = np.meshgrid(np.arange(kh), np.arange(kw), indexing="ij")
    ky = jnp.asarray(ky.reshape(-1), jnp.float32)
    kx = jnp.asarray(kx.reshape(-1), jnp.float32)

    py = base_y[None, :, None, None, None] + ky[None, None, None, None, :] \
        + off[..., 0]                               # (B, Ho, Wo, G, K2)
    px = base_x[None, None, :, None, None] + kx[None, None, None, None, :] \
        + off[..., 1]

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    fy = py - y0
    fx = px - x0

    xg = x.reshape(b, hin, win, g, cg).transpose(0, 3, 1, 2, 4)
    # pad by 1 so a (2,2) footprint based at clip(y0, -1..hin-1)+1 stays
    # in range; out-of-image corners are zeroed by the weights below.
    xp = jnp.pad(xg, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))

    ys = jnp.clip(y0, -1, hin - 1).astype(jnp.int32) + 1
    xs = jnp.clip(x0, -1, win - 1).astype(jnp.int32) + 1
    starts = jnp.stack([ys, xs], axis=-1)           # (B,Ho,Wo,G,K2,2)
    starts = starts.transpose(0, 3, 1, 2, 4, 5).reshape(b, g, n * k2, 2)

    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    gather1 = lambda op, st: jax.lax.gather(
        op, st, dn, slice_sizes=(2, 2, cg), mode="clip")
    foot = jax.vmap(jax.vmap(gather1))(xp, starts)  # (B,G,NK2,2,2,cg)

    def wcorner(dy, dx):
        yy = y0 + dy
        xx = x0 + dx
        valid = (yy >= 0) & (yy < hin) & (xx >= 0) & (xx < win)
        wy = (1.0 - fy) if dy == 0 else fy
        wx = (1.0 - fx) if dx == 0 else fx
        w = wy * wx * valid.astype(jnp.float32)
        return w.transpose(0, 3, 1, 2, 4).reshape(
            b, g, n * k2)[..., None].astype(x.dtype)

    out = (foot[:, :, :, 0, 0] * wcorner(0, 0) +
           foot[:, :, :, 0, 1] * wcorner(0, 1) +
           foot[:, :, :, 1, 0] * wcorner(1, 0) +
           foot[:, :, :, 1, 1] * wcorner(1, 1))
    mm = m.transpose(0, 3, 1, 2, 4).reshape(b, g, n * k2)
    out = out * mm[..., None].astype(x.dtype)

    # (B, G, N*K2, cg) -> tap-major (K2, C) to match HWIO flatten
    out = out.reshape(b, g, n, k2, cg).transpose(0, 2, 3, 1, 4)
    out = out.reshape(b, hout, wout, k2 * c)
    w = kernel.reshape(k2 * c, cout)
    res = out @ w
    if bias is not None:
        res = res + bias
    return res


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

    # Positions in f32 regardless of data dtype: bf16 loses whole pixels
    # past |x| ~ 256 (and half-pixels past 128), which at streaming
    # resolutions turns flow-guided offsets into wrong-pixel samples.
    off = offset.astype(jnp.float32).reshape(b, hout, wout, g, k2, 2)
    m = mask.reshape(b, hout, wout, g, k2)

    base_y = jnp.arange(hout, dtype=jnp.float32) * stride - padding
    base_x = jnp.arange(wout, dtype=jnp.float32) * stride - padding
    ky, kx = np.meshgrid(np.arange(kh), np.arange(kw), indexing="ij")
    ky = jnp.asarray(ky.reshape(-1), jnp.float32)
    kx = jnp.asarray(kx.reshape(-1), jnp.float32)

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
            b, hout * wout * k2, g)[..., None].astype(x.dtype)

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
