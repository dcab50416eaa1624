"""Modulated deformable convolution v2 (torchvision ``deform_conv2d``
semantics), TPU-native.

Formulated as gather + one im2col matmul: every kernel tap is bilinearly
sampled at its offset position (4 vectorized gathers), modulated by the
mask, and the (K*K*C_in, C_out) contraction runs as a single MXU matmul.
Out-of-image samples contribute zero (torchvision border behavior).

Reference usage: propainter_rfc.py:44 (SecondOrderDeformableAlignment),
propainter.py (BidirectionalPropagation) — offset layout
(B, 2*G*K*K, H, W) with (y, x) interleaved per (group, tap), mask
(B, G*K*K, H, W); here NHWC with the same channel ordering.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

__all__ = ["deform_conv2d"]


def deform_conv2d(x, offset, mask, kernel, bias: Optional[jnp.ndarray] = None,
                  stride: int = 1, padding: int = 1,
                  deform_groups: int = 1):
    """``x``: (B, H, W, C); ``offset``: (B, Ho, Wo, 2*G*K2);
    ``mask``: (B, Ho, Wo, G*K2) (post-sigmoid); ``kernel``: HWIO.
    Returns (B, Ho, Wo, O)."""
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
