"""Native checkpoint round-trip (Model.save / Model.load)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorchcv_tpu as ptc


def test_save_load_roundtrip(tmp_path):
    m = ptc.get_model("resnet10", in_size=(64, 64))
    path = m.save(str(tmp_path / "resnet10.msgpack"))
    m2 = ptc.get_model("resnet10", in_size=(64, 64), init=False).load(path)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
    np.testing.assert_array_equal(np.asarray(m(x)), np.asarray(m2(x)))


def test_static_extra_args_stay_out_of_trace():
    """Non-array positionals (ProPainter's ``lt``) must be jit-static:
    they drive Python-level slicing inside model code."""
    m = ptc.get_model("propainter", in_size=(48, 96))
    rs = np.random.RandomState(0)
    B, T, lt, H, W = 1, 6, 4, 48, 96
    fr = jnp.asarray(rs.rand(B, T, H, W, 3), jnp.float32)
    mu = jnp.asarray((rs.rand(B, T, H, W, 1) > 0.8).astype(np.float32))
    mi = jnp.asarray((rs.rand(B, T, H, W, 1) > 0.7).astype(np.float32))
    fl = jnp.asarray(rs.randn(B, lt - 1, H, W, 4).astype(np.float32))
    y = m(fr, mu, mi, fl, lt)       # jitted __call__ with int extra
    assert y.shape == (B, lt, H, W, 3)


def test_load_shape_mismatch_raises(tmp_path):
    m = ptc.get_model("resnet10", in_size=(64, 64))
    path = m.save(str(tmp_path / "ck.msgpack"))
    other = ptc.get_model("resnet18", in_size=(64, 64), init=False)
    with pytest.raises(ValueError):
        other.load(path)
