"""SuperPointNet parity vs the torch reference.

The reference detector's greedy sorted NMS is a host-side ragged algorithm;
ours is static-shape window-max NMS + top_k (see
pytorchcv_tpu/models/superpointnet.py docstring). Window maxima are provably
kept by BOTH, so our point set must be a subset of the reference's with
identical confidences and descriptors at shared points.
"""

import numpy as np
import pytest

from conftest import add_reference_to_path, has_reference

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference repo not mounted")


def test_superpointnet_parity():
    import torch

    import jax
    import jax.numpy as jnp
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.zoo.convert import convert_state_dict

    add_reference_to_path()
    import importlib
    ref_mod = importlib.import_module("pytorchcv.models.superpointnet")

    torch.manual_seed(0)
    ref = ref_mod.superpointnet(pretrained=False).eval()
    with torch.no_grad():
        for v in ref.state_dict().values():
            if v.ndim >= 2:
                v.mul_(0.5)  # damp random kaiming init (8 norm-free convs)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    model = ptc.get_model("superpointnet", init=False, in_size=(128, 128))
    assert model.num_params() == 1300865  # reference _test() assert
    variables = convert_state_dict(sd, model.shape_variables())
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    rs = np.random.RandomState(0)
    x = rs.rand(1, 1, 128, 128).astype(np.float32)
    with torch.no_grad():
        pts_l, confs_l, desc_l = ref(torch.from_numpy(x))
    pts, confs, desc, valid = model.module.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    pts, confs, desc, valid = map(np.asarray, (pts, confs, desc, valid))

    nv = int(valid[0].sum())
    assert nv > 50
    assert nv <= len(pts_l[0])
    ref_map = {tuple(p.tolist()): (float(c), d.numpy())
               for p, c, d in zip(pts_l[0], confs_l[0], desc_l[0])}
    for k in range(nv):
        key = tuple(pts[0, k].tolist())
        assert key in ref_map, f"point {key} not in reference set"
        rc, rd = ref_map[key]
        assert abs(float(confs[0, k]) - rc) < 1e-6
        assert float(np.abs(desc[0, k] - rd).max()) < 1e-5
