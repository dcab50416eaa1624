"""bf16 sampling-position precision regression tests.

Gather-based samplers (grid_sample / flow_warp / deform_conv2d /
RAFT lookup) must compute positions in f32 even when activations are
bf16: a bf16 pixel coordinate is ~2 px coarse at x~430 and a bf16
normalized grid is ~1 px coarse at W=432 — whole wrong pixels at
streaming resolutions. These tests run the samplers on bf16 inputs
against the f32 oracle and bound the error by bf16 *value* rounding
(small), not position rounding (catastrophic)."""

import jax.numpy as jnp
import numpy as np

from pytorchcv_tpu.models.propainter_ip import flow_warp
from pytorchcv_tpu.nn.deform import deform_conv2d
from pytorchcv_tpu.nn.ops import grid_sample


def test_flow_warp_bf16_positions():
    rs = np.random.RandomState(0)
    h, w = 240, 432
    x = rs.rand(1, h, w, 3).astype(np.float32)
    flow = (rs.randn(1, h, w, 2) * 5).astype(np.float32)
    ref = flow_warp(jnp.asarray(x), jnp.asarray(flow))
    out = flow_warp(jnp.asarray(x, jnp.bfloat16),
                    jnp.asarray(flow, jnp.bfloat16)).astype(jnp.float32)
    # bf16 flow quantization moves positions by <= 0.04 px at |flow|<=20;
    # with unit-range values the result moves by about that much. The
    # pre-fix bf16-position path erred by O(1) (whole pixels).
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 0.12, err


def test_grid_sample_bf16_grid():
    rs = np.random.RandomState(1)
    h, w = 64, 432
    x = rs.rand(1, h, w, 4).astype(np.float32)
    gx = rs.uniform(-1, 1, (1, 32, 48)).astype(np.float32)
    gy = rs.uniform(-1, 1, (1, 32, 48)).astype(np.float32)
    grid = np.stack([gx, gy], axis=-1)
    ref = grid_sample(jnp.asarray(x), jnp.asarray(grid))
    out = grid_sample(jnp.asarray(x, jnp.bfloat16),
                      jnp.asarray(grid)).astype(jnp.float32)
    # grid stays f32 here; only values are bf16 -> error ~ value rounding
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 0.02, err


def test_deform_bf16_positions():
    rs = np.random.RandomState(2)
    b, h, w, c, g = 1, 30, 300, 16, 4
    x = rs.rand(b, h, w, c).astype(np.float32)
    # flow-magnitude offsets: position error is what we're guarding
    offset = (rs.randn(b, h, w, 2 * g * 9) * 8).astype(np.float32)
    mask = rs.rand(b, h, w, g * 9).astype(np.float32)
    kern = (rs.randn(3, 3, c, c) * 0.05).astype(np.float32)
    ref = deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                        jnp.asarray(mask), jnp.asarray(kern),
                        deform_groups=g)
    out = deform_conv2d(jnp.asarray(x, jnp.bfloat16),
                        jnp.asarray(offset, jnp.bfloat16),
                        jnp.asarray(mask, jnp.bfloat16),
                        jnp.asarray(kern, jnp.bfloat16),
                        deform_groups=g).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(out - ref)))
    # bf16 value rounding through a 9*16-tap accumulation
    assert err < 0.25, err
