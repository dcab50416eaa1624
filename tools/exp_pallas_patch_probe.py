"""Probe: per-pixel bounded-patch gather as dynamic VMEM loads in a
Pallas kernel (core pattern for the deform kernel).

Mosaic constraints discovered here:
  - An (H, W, C) array small enough for VMEM is placed there; dynamic
    slicing its sublane dim (W) requires PROVABLY 8-aligned starts ->
    align starts down with pl.multiple_of and widen the window to 24
    columns; the extra columns are killed by the one-hot lerp weights.
  - The leading (major) dim H takes any dynamic start.
  - DMA HBM->VMEM per pixel hits the same alignment wall
    ("Failed to prove that a tile index in dimension 1 is divisible by
    the tiling (8)") — dynamic loads from resident VMEM avoid DMAs
    entirely at feat-prop sizes (60x128x128 bf16 = 2 MB).

Run: python tools/exp_pallas_patch_probe.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 10           # patch rows
QW = 24          # aligned window width (covers P cols at any alignment)
C = 128
TILE = 80


def kernel(starts_ref, x_ref, out_ref):
    def one(i, _):
        sy = starts_ref[i, 0]
        sxa = pl.multiple_of((starts_ref[i, 1] // 8) * 8, 8)
        patch = x_ref[pl.ds(sy, P), pl.ds(sxa, QW), :]
        out_ref[i] = jnp.sum(patch.astype(jnp.float32), axis=(0, 1))
        return 0

    jax.lax.fori_loop(0, TILE, one, 0)


def run_pallas(x, starts):
    n = starts.shape[0]
    grid = (n // TILE,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, 2), lambda t: (t, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, C), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, C), jnp.float32),
    )(starts, x)


def oracle(x, starts):
    st = jnp.stack([starts[:, 0], (starts[:, 1] // 8) * 8], axis=1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    patch = jax.lax.gather(x, st, dn, slice_sizes=(P, QW, C),
                           mode="clip")
    return jnp.sum(patch.astype(jnp.float32), axis=(1, 2))


def main():
    print("devices:", jax.devices(), flush=True)
    rs = np.random.RandomState(0)
    H, W = 60, 128
    n = 6480
    x = jnp.asarray(rs.randn(H, W, C), jnp.bfloat16)
    starts = jnp.asarray(
        np.stack([rs.randint(0, H - P, n), rs.randint(0, W - QW, n)], 1),
        jnp.int32)

    got = run_pallas(x, starts)
    want = oracle(x, starts)
    err = float(jnp.max(jnp.abs(got - want)))
    print("maxerr vs oracle:", err, flush=True)

    from exp_deform import timeit
    ms_p = timeit(run_pallas, x, starts)
    ms_o = timeit(oracle, x, starts)
    print(f"pallas {ms_p:.3f} ms   xla-gather oracle {ms_o:.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
