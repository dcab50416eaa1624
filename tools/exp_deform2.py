"""Deform gather round 2: attack the bf16 sub-32-bit gather penalty.

exp_deform.py measured (v5e, feat-prop shape (1,60,108,128) G=16):
footprint bf16 18.5 ms vs 4-corner f32 19.7 — bf16 gathers run SLOWER
per element than f32 ones. Variants here bitcast pairs of bf16 channels
into one f32 lane before the gather (exact bit preservation), halving
the gathered element count, and un-bitcast after.

Run on the real chip: python tools/exp_deform2.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pytorchcv_tpu.nn.deform import _deform_footprint, _deform_general
from exp_deform import timeit


def deform_footprint_f32cast(x, offset, mask, kernel, bias, deform_groups):
    """Footprint gather with the (2,2,cg) bf16 slices fetched as
    (2,2,cg//2) f32 slices via bitcast — same bytes, half the elements."""
    b, hin, win, c = x.shape
    kh, kw, cin, cout = kernel.shape
    assert x.dtype == jnp.bfloat16
    k2 = kh * kw
    g = deform_groups
    cg = c // g
    assert cg % 2 == 0
    _, hout, wout, _ = offset.shape
    n = hout * wout

    off = offset.astype(jnp.float32).reshape(b, hout, wout, g, k2, 2)
    m = mask.reshape(b, hout, wout, g, k2)

    base_y = jnp.arange(hout, dtype=jnp.float32) - 1.0
    base_x = jnp.arange(wout, dtype=jnp.float32) - 1.0
    ky, kx = np.meshgrid(np.arange(kh), np.arange(kw), indexing="ij")
    ky = jnp.asarray(ky.reshape(-1), jnp.float32)
    kx = jnp.asarray(kx.reshape(-1), jnp.float32)

    py = base_y[None, :, None, None, None] + ky[None, None, None, None, :] \
        + off[..., 0]
    px = base_x[None, None, :, None, None] + kx[None, None, None, None, :] \
        + off[..., 1]

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    fy = py - y0
    fx = px - x0

    xg = x.reshape(b, hin, win, g, cg).transpose(0, 3, 1, 2, 4)
    xp = jnp.pad(xg, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    # bf16 (..., cg) -> f32 (..., cg//2): exact bit packing
    xp32 = jax.lax.bitcast_convert_type(
        xp.reshape(b, g, hin + 2, win + 2, cg // 2, 2), jnp.float32)

    ys = jnp.clip(y0, -1, hin - 1).astype(jnp.int32) + 1
    xs = jnp.clip(x0, -1, win - 1).astype(jnp.int32) + 1
    starts = jnp.stack([ys, xs], axis=-1)
    starts = starts.transpose(0, 3, 1, 2, 4, 5).reshape(b, g, n * k2, 2)

    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    gather1 = lambda op, st: jax.lax.gather(
        op, st, dn, slice_sizes=(2, 2, cg // 2), mode="clip")
    foot32 = jax.vmap(jax.vmap(gather1))(xp32, starts)
    # back to bf16 channels: f32 (..., cg//2) -> bf16 (..., cg)
    foot = jax.lax.bitcast_convert_type(foot32, jnp.bfloat16).reshape(
        b, g, n * k2, 2, 2, cg)

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

    out = out.reshape(b, g, n, k2, cg).transpose(0, 2, 3, 1, 4)
    out = out.reshape(b, hout, wout, k2 * c)
    w = kernel.reshape(k2 * c, cout)
    res = out @ w
    if bias is not None:
        res = res + bias
    return res


def deform_pergroup_f32cast(x, offset, mask, kernel, bias, deform_groups):
    """4-corner row gather on (HW, g, cg//2) f32-bitcast operand."""
    b, hin, win, c = x.shape
    kh, kw, cin, cout = kernel.shape
    assert x.dtype == jnp.bfloat16
    k2 = kh * kw
    g = deform_groups
    cg = c // g
    _, hout, wout, _ = offset.shape

    off = offset.astype(jnp.float32).reshape(b, hout, wout, g, k2, 2)
    m = mask.reshape(b, hout, wout, g, k2)

    base_y = jnp.arange(hout, dtype=jnp.float32) - 1.0
    base_x = jnp.arange(wout, dtype=jnp.float32) - 1.0
    ky, kx = np.meshgrid(np.arange(kh), np.arange(kw), indexing="ij")
    ky = jnp.asarray(ky.reshape(-1), jnp.float32)
    kx = jnp.asarray(kx.reshape(-1), jnp.float32)

    py = base_y[None, :, None, None, None] + ky[None, None, None, None, :] \
        + off[..., 0]
    px = base_x[None, None, :, None, None] + kx[None, None, None, None, :] \
        + off[..., 1]

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = py - y0
    wx = px - x0

    x32 = jax.lax.bitcast_convert_type(
        x.reshape(b, hin * win, g, cg // 2, 2), jnp.float32)

    def corner(yi, xi):
        valid = (yi >= 0) & (yi < hin) & (xi >= 0) & (xi < win)
        yc = jnp.clip(yi, 0, hin - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, win - 1).astype(jnp.int32)
        flat = yc * win + xc
        flat = flat.transpose(0, 1, 2, 4, 3)
        flat = flat.reshape(b, hout * wout * k2, g)
        v32 = jnp.take_along_axis(x32, flat[..., None, None], axis=1)
        v = jax.lax.bitcast_convert_type(v32, jnp.bfloat16).reshape(
            b, hout * wout * k2, g, cg)
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
    sampled = sampled.reshape(b, hout, wout, k2 * c)
    w = kernel.reshape(k2 * c, cout)
    out = sampled @ w
    if bias is not None:
        out = out + bias
    return out


def main():
    print("devices:", jax.devices())
    rng = np.random.RandomState(0)
    b, h, w, c, g = 1, 60, 108, 128, 16
    k2 = 9
    dtype = jnp.bfloat16
    x = jnp.asarray(rng.randn(b, h, w, c), dtype)
    flow = rng.randn(b, h, w, 1, 1, 2) * 12.0
    resid = np.tanh(rng.randn(b, h, w, g, k2, 2)) * 3.0
    offset = jnp.asarray((flow + resid).reshape(b, h, w, g * k2 * 2), dtype)
    mask = jnp.asarray(1 / (1 + np.exp(-rng.randn(b, h, w, g * k2))), dtype)
    kernel = jnp.asarray(rng.randn(3, 3, c, c) * 0.05, dtype)
    bias = jnp.asarray(rng.randn(c) * 0.1, dtype)

    ref = _deform_footprint(x, offset, mask, kernel, bias, 1, 1, g)

    variants = {
        "footprint (ship)": lambda *a: _deform_footprint(*a[:5], 1, 1, g),
        "footprint-f32cast": lambda *a: deform_footprint_f32cast(
            *a, deform_groups=g),
        "pergroup-f32cast": lambda *a: deform_pergroup_f32cast(
            *a, deform_groups=g),
        "general (4-corner)": lambda *a: _deform_general(*a[:5], 1, 1, g),
    }
    print(f"=== bf16  shape ({b},{h},{w},{c}) G={g} ===")
    for name, fn in variants.items():
        out = fn(x, offset, mask, kernel, bias)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) -
                                    ref.astype(jnp.float32))))
        ms = timeit(fn, x, offset, mask, kernel, bias)
        print(f"{name:20s}: {ms:8.3f} ms   maxerr vs footprint {err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
