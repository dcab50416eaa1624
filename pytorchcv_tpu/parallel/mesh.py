"""Device mesh helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(axis_shapes: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("data", "model"),
              devices=None) -> Mesh:
    """Build a Mesh over the available devices.

    Default factorization puts everything on ``data`` (pure DP) with a
    trivial ``model`` axis; pass ``axis_shapes`` to carve out tensor /
    spatial parallel dimensions (collectives then ride ICI neighbors because
    axes are laid out in device order).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_shapes is None:
        axis_shapes = (n,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(axis_shapes)) == n, (
        f"mesh {axis_shapes} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(axis_shapes)
    return Mesh(dev_array, tuple(axis_names))
