"""Speech-driven facial animation / 3D face models parity vs the torch
reference (voca, nvpattexp, visemenet — non-image inputs — plus pfpcnet).
Also exercises the torch-compatible LSTM (nn/rnn.py)."""

import numpy as np
import pytest

from conftest import (add_reference_to_path, has_reference,
                      randomize_stateful_tensors)

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference repo not mounted")


def _convert(name, ref):
    import jax
    import jax.numpy as jnp
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.zoo.convert import convert_state_dict

    randomize_stateful_tensors(ref)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    model = ptc.get_model(name, init=False)
    variables = convert_state_dict(sd, model.shape_variables())
    return model, jax.tree_util.tree_map(jnp.asarray, variables)


def test_voca_parity():
    import torch
    import jax.numpy as jnp
    add_reference_to_path()
    from pytorchcv.models import voca as ref_mod

    torch.manual_seed(0)
    ref = ref_mod.voca8flame(pretrained=False).eval()
    model, variables = _convert("voca8flame", ref)
    rs = np.random.RandomState(0)
    x = rs.randn(3, 1, 16, 29).astype(np.float32)
    pid = np.full((3,), 3)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x),
                    torch.from_numpy(pid.astype(np.float32)))
    y = model.module.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                           jnp.asarray(pid, jnp.int32), train=False)
    err = np.abs(np.asarray(y) - y_ref.numpy()).max() / \
        (np.abs(y_ref.numpy()).max() + 1e-9)
    assert y.shape == (3, 1, 5023, 3)
    assert err < 1e-5


def test_nvpattexp_parity():
    import torch
    import jax.numpy as jnp
    add_reference_to_path()
    from pytorchcv.models import nvpattexp as ref_mod

    torch.manual_seed(0)
    ref = ref_mod.nvpattexp116bazel76(pretrained=False).eval()
    model, variables = _convert("nvpattexp116bazel76", ref)
    rs = np.random.RandomState(0)
    x = rs.randn(3, 8, 16, 29).astype(np.float32)
    pid = np.full((3,), 3, np.int64)
    with torch.no_grad():
        y1_ref, y2_ref = ref(torch.from_numpy(x), torch.from_numpy(pid))
    y1, y2 = model.module.apply(variables, jnp.asarray(x),
                                jnp.asarray(pid, jnp.int32), train=False)
    for a, b in [(y1, y1_ref), (y2, y2_ref)]:
        err = np.abs(np.asarray(a) - b.numpy()).max() / \
            (np.abs(b.numpy()).max() + 1e-9)
        assert err < 1e-5


def test_visemenet_parity():
    import torch
    import jax.numpy as jnp
    add_reference_to_path()
    from pytorchcv.models import visemenet as ref_mod

    torch.manual_seed(0)
    ref = ref_mod.visemenet20(pretrained=False).eval()
    model, variables = _convert("visemenet20", ref)
    rs = np.random.RandomState(0)
    x = rs.randn(40, 8, 195).astype(np.float32)
    pid = np.full((40, 76), 3.0, np.float32)
    with torch.no_grad():
        yr = ref(torch.from_numpy(x), torch.from_numpy(pid))
    ys = model.module.apply(variables, jnp.asarray(x), jnp.asarray(pid),
                            train=False)
    assert ys[0].shape == (8, 20) and ys[2].shape == (8, 2)
    for a, b in zip(ys, yr):
        err = np.abs(np.asarray(a) - b.numpy()).max() / \
            (np.abs(b.numpy()).max() + 1e-9)
        assert err < 1e-5


def test_pfpcnet_parity():
    import torch
    import jax.numpy as jnp
    add_reference_to_path()
    from pytorchcv.models import pfpcnet as ref_mod

    torch.manual_seed(0)
    ref = ref_mod.pfpcnet(pretrained=False).eval()
    model, variables = _convert("pfpcnet", ref)
    rs = np.random.RandomState(0)
    x = rs.randn(2, 1, 320, 240).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x))
    y = model.module.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                           train=False)
    err = np.abs(np.asarray(y) - y_ref.numpy()).max() / \
        (np.abs(y_ref.numpy()).max() + 1e-9)
    assert y.shape == (2, 5023, 3)
    assert err < 1e-5
