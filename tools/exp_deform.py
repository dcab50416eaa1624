"""Deformable-conv formulation A/B at the ProPainter feat-prop hot shape.

The flow-guided deform recurrence is 592 of 737 ms per transformer
window (STATUS.md). The general path costs ~25 ms/step, dominated by
4 corner gathers of (B, N*K2, G) indices each fetching cg=8 elements —
~3.7 M indexed fetches. Variants measured here attack the per-index
cost: fewer/bigger gathers, per-group vmapped gathers, dtype width.

Run on the real chip: python tools/exp_deform.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pytorchcv_tpu.nn.deform import (_deform_footprint, _deform_general,
                                     deform_conv2d)

ITERS = 20


def timeit(fn, *args):
    @functools.partial(jax.jit, static_argnums=0)
    def run_n(n, *a):
        def body(carry, i):
            def vary(x):
                if jnp.issubdtype(x.dtype, jnp.floating):
                    return x + (i.astype(x.dtype) * jnp.asarray(1e-6,
                                                                x.dtype))
                return x
            out = fn(*jax.tree_util.tree_map(vary, a))
            leaves = jax.tree_util.tree_leaves(out)
            return carry + leaves[0].astype(jnp.float32).sum(), None
        carry, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                jnp.arange(n))
        return carry

    float(run_n(1, *args))
    float(run_n(ITERS, *args))
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); float(run_n(1, *args))
        t1 = time.time(); float(run_n(ITERS, *args))
        t2 = time.time()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (ITERS - 1))
    return best * 1e3  # ms


# ---------------------------------------------------------------- variants

def deform_footprint(x, offset, mask, kernel, bias, deform_groups):
    """One lax.gather of a (2, 2, cg) footprint per sample (4x fewer
    indices than the 4-corner take_along_axis path)."""
    b, hin, win, c = x.shape
    kh, kw, cin, cout = kernel.shape
    k2 = kh * kw
    g = deform_groups
    cg = c // g
    _, hout, wout, _ = offset.shape
    n = hout * wout

    off = offset.reshape(b, hout, wout, g, k2, 2)
    m = mask.reshape(b, hout, wout, g, k2)

    base_y = jnp.arange(hout, dtype=jnp.float32) - 1.0
    base_x = jnp.arange(wout, dtype=jnp.float32) - 1.0
    ky, kx = np.meshgrid(np.arange(kh), np.arange(kw), indexing="ij")
    ky = jnp.asarray(ky.reshape(-1), jnp.float32)
    kx = jnp.asarray(kx.reshape(-1), jnp.float32)

    py = base_y[None, :, None, None, None] + ky[None, None, None, None, :] \
        + off[..., 0].astype(jnp.float32)
    px = base_x[None, None, :, None, None] + kx[None, None, None, None, :] \
        + off[..., 1].astype(jnp.float32)

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    fy = py - y0
    fx = px - x0

    xg = x.reshape(hin, win, g, cg).transpose(2, 0, 1, 3)  # (G, H, W, cg)
    # pad by 1 so a (2,2) footprint starting at clip(y0, -1..hin-1)+1 is
    # always in range AND out-of-image corners read zeros.
    xp = jnp.pad(xg, ((0, 0), (1, 1), (1, 1), (0, 0)))

    ys = jnp.clip(y0, -1, hin - 1).astype(jnp.int32) + 1
    xs = jnp.clip(x0, -1, win - 1).astype(jnp.int32) + 1
    # validity per corner handled by weight zeroing below
    starts = jnp.stack([ys, xs], axis=-1)          # (B,Ho,Wo,G,K2,2)
    starts = starts.transpose(0, 3, 1, 2, 4, 5).reshape(b, g, n * k2, 2)

    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    gather1 = lambda op, st: jax.lax.gather(
        op, st, dn, slice_sizes=(2, 2, cg), mode="clip")
    # (B, G, N*K2, 2, 2, cg)
    foot = jax.vmap(jax.vmap(gather1))(
        jnp.broadcast_to(xp, (b,) + xp.shape), starts)

    # corner weights, zeroing out-of-image corners exactly like the
    # reference (valid = corner inside the unpadded image)
    def wcorner(dy, dx):
        yy = y0 + dy
        xx = x0 + dx
        valid = (yy >= 0) & (yy < hin) & (xx >= 0) & (xx < win)
        wy = jnp.where(dy == 0, 1.0 - fy, fy)
        wx = jnp.where(dx == 0, 1.0 - fx, fx)
        w = wy * wx * valid.astype(jnp.float32)
        # also zero when clip moved the footprint (corner outside pad box)
        return w.transpose(0, 3, 1, 2, 4).reshape(b, g, n * k2)

    out = (foot[:, :, :, 0, 0] * wcorner(0, 0)[..., None].astype(x.dtype) +
           foot[:, :, :, 0, 1] * wcorner(0, 1)[..., None].astype(x.dtype) +
           foot[:, :, :, 1, 0] * wcorner(1, 0)[..., None].astype(x.dtype) +
           foot[:, :, :, 1, 1] * wcorner(1, 1)[..., None].astype(x.dtype))
    mm = m.transpose(0, 3, 1, 2, 4).reshape(b, g, n * k2)
    out = out * mm[..., None].astype(x.dtype)

    # (B, G, N*K2, cg) -> (B, N, K2, G, cg) -> (B,Ho,Wo,K2*C)
    out = out.reshape(b, g, n, k2, cg).transpose(0, 2, 3, 1, 4)
    out = out.reshape(b, hout, wout, k2 * c)
    w = kernel.reshape(k2 * c, cout)
    res = out @ w
    if bias is not None:
        res = res + bias
    return res


def deform_pergroup(x, offset, mask, kernel, bias, deform_groups):
    """4-corner path but with per-group vmapped row gathers on a
    (HW, cg) operand (shallower index tuples than take_along_axis)."""
    b, hin, win, c = x.shape
    kh, kw, cin, cout = kernel.shape
    k2 = kh * kw
    g = deform_groups
    cg = c // g
    _, hout, wout, _ = offset.shape
    n = hout * wout

    off = offset.reshape(b, hout, wout, g, k2, 2)
    m = mask.reshape(b, hout, wout, g, k2)

    base_y = jnp.arange(hout, dtype=jnp.float32) - 1.0
    base_x = jnp.arange(wout, dtype=jnp.float32) - 1.0
    ky, kx = np.meshgrid(np.arange(kh), np.arange(kw), indexing="ij")
    ky = jnp.asarray(ky.reshape(-1), jnp.float32)
    kx = jnp.asarray(kx.reshape(-1), jnp.float32)

    py = base_y[None, :, None, None, None] + ky[None, None, None, None, :] \
        + off[..., 0].astype(jnp.float32)
    px = base_x[None, None, :, None, None] + kx[None, None, None, None, :] \
        + off[..., 1].astype(jnp.float32)

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = py - y0
    wx = px - x0

    xg = x.reshape(hin * win, g, cg).transpose(1, 0, 2)  # (G, HW, cg)

    def corner(yi, xi):
        valid = (yi >= 0) & (yi < hin) & (xi >= 0) & (xi < win)
        yc = jnp.clip(yi, 0, hin - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, win - 1).astype(jnp.int32)
        flat = (yc * win + xc).transpose(0, 3, 1, 2, 4).reshape(
            b, g, n * k2)
        v = jax.vmap(lambda opg, idxg: opg[idxg], in_axes=(0, 0))(
            jnp.broadcast_to(xg, (b,) + xg.shape).reshape(
                b * g, hin * win, cg),
            flat.reshape(b * g, n * k2))
        v = v.reshape(b, g, n * k2, cg)
        vm = valid.transpose(0, 3, 1, 2, 4).reshape(b, g, n * k2)
        return v * vm[..., None].astype(x.dtype)

    v00 = corner(y0, x0)
    v01 = corner(y0, x0 + 1)
    v10 = corner(y0 + 1, x0)
    v11 = corner(y0 + 1, x0 + 1)

    def wgt(a):
        return a.transpose(0, 3, 1, 2, 4).reshape(
            b, g, n * k2)[..., None].astype(x.dtype)

    sampled = (v00 * wgt((1 - wy) * (1 - wx)) + v01 * wgt((1 - wy) * wx) +
               v10 * wgt(wy * (1 - wx)) + v11 * wgt(wy * wx))
    sampled = sampled * wgt(m)
    sampled = sampled.reshape(b, g, n, k2, cg).transpose(0, 2, 3, 1, 4)
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
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.randn(b, h, w, c), dtype)
        flow = rng.randn(b, h, w, 1, 1, 2) * 12.0
        resid = np.tanh(rng.randn(b, h, w, g, k2, 2)) * 3.0
        offset = jnp.asarray((flow + resid).reshape(b, h, w, g * k2 * 2),
                             dtype)
        mask = jnp.asarray(1 / (1 + np.exp(-rng.randn(b, h, w, g * k2))),
                           dtype)
        kernel = jnp.asarray(rng.randn(3, 3, c, c) * 0.05, dtype)
        bias = jnp.asarray(rng.randn(c) * 0.1, dtype)

        ref = _deform_general(x, offset, mask, kernel, bias, 1, 1, g)

        variants = {
            "general": lambda *a: _deform_general(*a[:5], 1, 1, g),
            "footprint": lambda *a: _deform_footprint(*a[:5], 1, 1, g),
            "footprint-local": lambda *a: deform_footprint(
                *a, deform_groups=g),
            "pergroup": lambda *a: deform_pergroup(*a, deform_groups=g),
        }
        print(f"\n=== dtype {dtype.__name__}  shape ({b},{h},{w},{c}) "
              f"G={g} ===")
        for name, fn in variants.items():
            out = fn(x, offset, mask, kernel, bias)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) -
                                        ref.astype(jnp.float32))))
            ms = timeit(fn, x, offset, mask, kernel, bias)
            print(f"{name:12s}: {ms:8.3f} ms   maxerr vs general {err:.2e}")


if __name__ == "__main__":
    main()
