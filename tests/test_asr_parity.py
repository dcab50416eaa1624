"""ASR (Jasper/QuartzNet) parity: the masked-conv trunk is compared against
the torch reference on the ``from_audio=False`` path. The mel front-end is
numerically verified separately in test_asr_frontend.py (torch-ops oracle
of the reference chain + independent Slaney filterbank derivation —
librosa itself is absent in this env)."""

import numpy as np
import pytest

from conftest import (add_reference_to_path, has_reference,
                      randomize_stateful_tensors)

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference repo not mounted")

CASES = [
    ("jasper5x3", "jasper5x3", 29),
    ("jasperdr10x5_en", "jasperdr10x5_en", 29),
    ("quartznet5x5_en_ls", "quartznet5x5_en_ls", 29),
]


@pytest.mark.parametrize("name,ref_ctor,num_classes", CASES)
def test_asr_trunk_parity(name, ref_ctor, num_classes):
    import torch

    import jax
    import jax.numpy as jnp
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.zoo.convert import convert_state_dict

    add_reference_to_path()
    import importlib
    ref_mod = importlib.import_module(
        "pytorchcv.models.jasper" if name.startswith("jasper") and
        "dr" not in name else
        ("pytorchcv.models.jasperdr" if "dr" in name
         else "pytorchcv.models.quartznet"))
    torch.manual_seed(0)
    ref = getattr(ref_mod, ref_ctor)(pretrained=False,
                                     from_audio=False).eval()
    randomize_stateful_tensors(ref)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    model = ptc.get_model(name, init=False, from_audio=False)
    variables = convert_state_dict(sd, model.shape_variables())
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    rs = np.random.RandomState(0)
    T = 128
    x = rs.randn(2, 64, T).astype(np.float32)  # torch NCW
    x_len = np.array([T, T - 21], np.int64)
    with torch.no_grad():
        y_ref, y_len_ref = ref(torch.from_numpy(x),
                               torch.from_numpy(x_len))
    y, y_len = model.module.apply(
        variables, jnp.asarray(x.transpose(0, 2, 1)),
        jnp.asarray(x_len, jnp.int32), train=False)
    y = np.asarray(y).transpose(0, 2, 1)
    assert y.shape == tuple(y_ref.shape)
    assert np.array_equal(np.asarray(y_len), y_len_ref.numpy())
    err = np.abs(y - y_ref.numpy()).max() / (np.abs(y_ref.numpy()).max()
                                             + 1e-9)
    assert err < 2e-4, f"{name}: rel err {err:.2e}"


def test_mel_frontend_smoke():
    import jax
    import jax.numpy as jnp
    from pytorchcv_tpu.models.jasper import NemoMelSpecExtractor

    mod = NemoMelSpecExtractor()
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16000), jnp.float32)
    x_len = jnp.array([16000, 12345], jnp.int32)
    (mel, mel_len), _ = mod.init_with_output(jax.random.PRNGKey(0), x, x_len)
    assert mel.shape[0] == 2 and mel.shape[2] == 64
    assert mel.shape[1] % 16 == 0
    assert bool(jnp.isfinite(mel).all())
    assert int(mel_len[0]) == 100
