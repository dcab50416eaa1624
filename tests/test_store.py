"""Weight-store unit tests: registry lookup, SHA1 verification, cache
behavior, torch-checkpoint reading (reference model_store.py analog).

Network download itself can't run here (zero egress); these cover every
branch up to the HTTP call.
"""

import hashlib
import os

import numpy as np
import pytest

from pytorchcv_tpu.zoo import store


def test_metainfo_dict_loads_once():
    d1 = store.get_model_metainfo_dict()
    d2 = store.get_model_metainfo_dict()
    assert d1 is d2                      # memoized, not re-parsed
    assert len(d1) > 700


def test_metainfo_lookup():
    info = store.get_model_metainfo("resnet50")
    assert info["params"] == 25557032
    assert info["dataset"] == "in1k"
    with pytest.raises(ValueError):
        store.get_model_metainfo("not_a_model")


def test_sha1_check(tmp_path):
    p = tmp_path / "blob.bin"
    p.write_bytes(b"hello world")
    good = hashlib.sha1(b"hello world").hexdigest()
    assert store._check_sha1(str(p), good)
    assert not store._check_sha1(str(p), "0" * 40)


def test_get_model_file_cache_hit(tmp_path, monkeypatch):
    """A cached file with a valid SHA1 is returned without any download."""
    meta = store.get_model_metainfo_dict()
    name = next(k for k, v in meta.items() if v["sha1"])
    info = meta[name]
    content = b"fake checkpoint bytes"
    sha1 = hashlib.sha1(content).hexdigest()
    monkeypatch.setitem(info, "sha1", sha1)
    fname = f"{name}-{info['error']}-{sha1[:8]}.pth"
    (tmp_path / fname).write_bytes(content)

    def boom(*a, **k):
        raise AssertionError("download attempted despite cache hit")
    monkeypatch.setattr(store, "download_model_file", boom)
    path = store.get_model_file(name, root=str(tmp_path))
    assert path == str(tmp_path / fname)


def test_get_model_file_rejects_unreleased():
    meta = store.get_model_metainfo_dict()
    name = next(k for k, v in meta.items() if not v["sha1"])
    with pytest.raises(ValueError):
        store.get_model_file(name)


def test_load_torch_checkpoint_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    torch.set_num_threads(1)
    sd = {"features.conv.weight": torch.arange(12.0).reshape(3, 4),
          "output.bias": torch.zeros(5)}
    p = tmp_path / "ck.pth"
    torch.save(sd, str(p))
    loaded = store.load_torch_checkpoint(str(p))
    assert set(loaded) == set(sd)
    np.testing.assert_allclose(np.asarray(loaded["features.conv.weight"]),
                               np.arange(12.0).reshape(3, 4))
