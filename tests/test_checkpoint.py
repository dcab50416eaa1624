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


def test_load_shape_mismatch_raises(tmp_path):
    m = ptc.get_model("resnet10", in_size=(64, 64))
    path = m.save(str(tmp_path / "ck.msgpack"))
    other = ptc.get_model("resnet18", in_size=(64, 64), init=False)
    with pytest.raises(ValueError):
        other.load(path)
