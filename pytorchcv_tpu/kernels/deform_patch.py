"""Pallas bounded-offset deformable-conv sampler.

The zoo's only deform users (flow-guided alignment,
models/propainter_rfc.py SecondOrderDeformableAlignment) produce
``offset = center(pixel) + residual`` with ``|residual| <=
max_residue_magnitude`` (tanh-capped), so all K2*G samples of a pixel
live inside a (P, P) window around ``pixel + center``. XLA formulations
of that sampling are gather-bound (nn/deform.py: footprint 18.4 ms bf16
at the ProPainter feat-prop shape; per-pixel patch gather 30 ms — the
gather pays per index). This kernel instead keeps the WHOLE feature map
resident in VMEM and issues one dynamic (P, QW, C) value load per pixel:

  - W starts are aligned down to the 8-sublane tile (Mosaic requires
    provably aligned sublane slices; ``pl.multiple_of``), and the
    window is widened to QW columns so the unaligned residue is
    absorbed by the one-hot lerp weights;
  - lanes carry the full channel dim (G groups x cg channels), so each
    (k2, p) step is one vector FMA over (QW, C) — bilinear weights are
    built in-kernel from patch-relative positions via iota comparisons;
  - probe: tools/exp_pallas_patch_probe.py (dynamic VMEM loads measured
    ~500x the XLA gather's throughput at this shape; HBM->VMEM DMA
    per pixel was rejected by Mosaic: unprovable sublane alignment).

The kernel returns the sampled+modulated (N, K2, C) tensor; the final
(K2*C, O) matmul stays in XLA. Exact vs nn/deform.py's general path
(same one-hot lerp + OOB-zero semantics); parity-tested in
tests/test_pallas_kernels.py (interpret mode) and in
tests/test_propainter_parity.py against the torchvision oracle.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["deform_sample_patch"]


def _kernel(starts_ref, py_ref, px_ref, m_ref, x_ref, out_ref, *,
            tile, p_rows, qw, k2):
    def one(i, _):
        sy = starts_ref[i, 0]
        sxa = pl.multiple_of((starts_ref[i, 1] // 8) * 8, 8)
        patch = x_ref[pl.ds(sy, p_rows), pl.ds(sxa, qw), :].astype(
            jnp.float32)                       # (P, QW, C)
        py = py_ref[i]                         # (k2, C) patch-relative
        px = px_ref[i]
        y0 = jnp.floor(py)
        fy = py - y0
        x0 = jnp.floor(px)
        fx = px - x0
        rows = jnp.zeros((k2, qw) + py.shape[-1:], jnp.float32)
        for p in range(p_rows):
            wy = (1.0 - fy) * (y0 == p) + fy * (y0 == p - 1)  # (k2, C)
            rows = rows + wy[:, None, :] * patch[p][None]
        acc = jnp.zeros_like(py)
        for q in range(qw):
            wx = (1.0 - fx) * (x0 == q) + fx * (x0 == q - 1)
            acc = acc + wx * rows[:, q, :]
        out_ref[i] = (acc * m_ref[i].astype(jnp.float32)).astype(
            out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, tile, one, 0)


@functools.partial(jax.jit, static_argnames=("p_rows", "tile",
                                             "interpret"))
def _sample(x_pad, starts, py_rel, px_rel, m, p_rows, tile,
            interpret=False):
    n, k2, c = py_rel.shape
    qw = 8 * math.ceil((7 + p_rows) / 8)
    grid = (n // tile,)
    kern = functools.partial(_kernel, tile=tile, p_rows=p_rows, qw=qw,
                             k2=k2)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 2), lambda t: (t, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, k2, c), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k2, c), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k2, c), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, k2, c), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, k2, c), x_pad.dtype),
        interpret=interpret,
    )(starts, py_rel, px_rel, m, x_pad)


def deform_sample_patch(x, offset, mask, deform_groups, center,
                        residue_bound, p_rows, tile=80,
                        interpret=False):
    """Sampled+modulated deform-conv taps via the Pallas patch kernel.

    ``x``: (1, H, W, C); ``offset``: (1, H, W, 2*G*K2) (y, x) pairs with
    ``offset == tile(center) + r``, ``|r| <= residue_bound``; ``mask``:
    (1, H, W, G*K2); ``center``: (1, H, W, 2). Returns (1, H, W, K2*C)
    tap-major samples ready for the (K2*C, O) matmul. Caller guarantees
    b == 1, stride 1, 3x3 kernel, padding 1.
    """
    b, hin, win, c = x.shape
    assert b == 1
    g = deform_groups
    cg = c // g
    k2 = 9
    n = hin * win
    qw = 8 * math.ceil((7 + p_rows) / 8)
    margin = math.ceil(residue_bound) + 1

    off = offset.astype(jnp.float32).reshape(hin, win, g, k2, 2)
    cy = center[0, ..., 0].astype(jnp.float32)
    cx = center[0, ..., 1].astype(jnp.float32)

    iy = jnp.arange(hin, dtype=jnp.float32)[:, None]
    ix = jnp.arange(win, dtype=jnp.float32)[None, :]
    sy = jnp.clip(jnp.floor(iy + cy) - margin, 0,
                  hin - p_rows).astype(jnp.int32)
    sx = jnp.clip(jnp.floor(ix + cx) - margin, 0,
                  win - p_rows).astype(jnp.int32)
    sxa = (sx // 8) * 8
    starts = jnp.stack([sy, sx], axis=-1).reshape(n, 2)

    ky, kx = jnp.meshgrid(jnp.arange(3, dtype=jnp.float32),
                          jnp.arange(3, dtype=jnp.float32),
                          indexing="ij")
    ky = ky.reshape(-1)
    kx = kx.reshape(-1)
    # absolute sample positions (pad=1), then window-relative (f32)
    py = (iy[..., None, None] - 1.0 + ky + off[..., 0]) \
        - sy.astype(jnp.float32)[..., None, None]     # (H, W, G, K2)
    px = (ix[..., None, None] - 1.0 + kx + off[..., 1]) \
        - sxa.astype(jnp.float32)[..., None, None]

    def lanes(a, dtype):
        # (H, W, G, K2) -> (N, K2, G*cg): group value repeated over its
        # cg lane slots (channel layout is g-major)
        a = a.transpose(0, 1, 3, 2).reshape(n, k2, g)
        return jnp.repeat(a, cg, axis=-1).astype(dtype)

    py_l = lanes(py, jnp.float32)
    px_l = lanes(px, jnp.float32)
    m_l = lanes(mask.reshape(hin, win, g, k2), x.dtype)

    # pad W so any aligned window fits: sxa <= hin-p_rows -> + qw
    wpad = 8 * math.ceil(win / 8)
    while wpad < ((win - p_rows) // 8) * 8 + qw:
        wpad += 8
    x_pad = jnp.pad(x[0], ((0, 0), (0, wpad - win), (0, 0)))

    pad_n = (-n) % tile
    if pad_n:
        starts = jnp.concatenate(
            [starts, jnp.zeros((pad_n, 2), jnp.int32)], 0)
        py_l = jnp.concatenate(
            [py_l, jnp.zeros((pad_n, k2, c), jnp.float32)], 0)
        px_l = jnp.concatenate(
            [px_l, jnp.zeros((pad_n, k2, c), jnp.float32)], 0)
        m_l = jnp.concatenate([m_l, jnp.zeros((pad_n, k2, c), x.dtype)],
                              0)
    out = _sample(x_pad, starts, py_l, px_l, m_l, p_rows, tile,
                  interpret=interpret)
    if pad_n:
        out = out[:n]
    return out.reshape(1, hin, win, k2 * c)
