"""Optical-flow (RAFT) parity vs the torch reference.

Conv weights are damped (x0.3) before conversion on BOTH sides: RAFT's
random kaiming init explodes through the un-normalized context net, and the
12-step recurrence amplifies it to NaN. Input must be >= 128 per side —
below that the level-3 correlation map is 1x1 and the REFERENCE's own
bilinear_sampler divides by zero (raft.py:139).
"""

import numpy as np
import pytest

from conftest import (add_reference_to_path, has_reference,
                      randomize_stateful_tensors)

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference repo not mounted")

CASES = ["raft_small", "raft_things"]


@pytest.mark.parametrize("name", CASES)
def test_raft_parity(name):
    import torch

    import jax
    import jax.numpy as jnp
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.zoo.convert import convert_state_dict

    add_reference_to_path()
    import importlib
    ref_mod = importlib.import_module("pytorchcv.models.raft")

    torch.manual_seed(0)
    ref = getattr(ref_mod, name)(pretrained=False).eval()
    randomize_stateful_tensors(ref)
    with torch.no_grad():
        for v in ref.state_dict().values():
            if v.ndim >= 2:
                v.mul_(0.3)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    H, W = 128, 160
    model = ptc.get_model(name, init=False, in_size=(H, W))
    variables = convert_state_dict(sd, model.shape_variables())
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    rs = np.random.RandomState(0)
    x1 = rs.rand(1, 3, H, W).astype(np.float32) * 255.0
    x2 = rs.rand(1, 3, H, W).astype(np.float32) * 255.0
    with torch.no_grad():
        f8_ref, fup_ref = ref(torch.from_numpy(x1), torch.from_numpy(x2))
    f8, fup = model.module.apply(
        variables, jnp.asarray(x1.transpose(0, 2, 3, 1)),
        jnp.asarray(x2.transpose(0, 2, 3, 1)), train=False)
    for mine, theirs, tag in [(f8, f8_ref, "flow8"), (fup, fup_ref, "up")]:
        mine = np.asarray(mine).transpose(0, 3, 1, 2)
        theirs = theirs.numpy()
        assert mine.shape == theirs.shape
        assert np.isfinite(theirs).all(), f"{name}/{tag}: reference NaN"
        err = np.abs(mine - theirs).max() / (np.abs(theirs).max() + 1e-9)
        assert err < 1e-4, f"{name}/{tag}: rel err {err:.2e}"


def test_bidirectional_video_flow_shapes():
    import jax.numpy as jnp
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.models.raft import (
        calc_bidirectional_optical_flow_on_video_by_raft)

    model = ptc.get_model("raft_small", init=True, in_size=(128, 128),
                          iters=2)
    frames = jnp.zeros((3, 128, 128, 3))
    flows = calc_bidirectional_optical_flow_on_video_by_raft(
        lambda a, b: model.apply(model.variables, a, b), frames)
    assert flows.shape == (2, 128, 128, 4)
    assert bool(jnp.isfinite(flows).all())


def test_lookup_corr_matmul_matches_gather():
    """The MXU matmul reformulation of the correlation-window lookup must
    match the direct grid_sample port everywhere, including windows that
    straddle the volume border (zeros padding)."""
    import jax
    import jax.numpy as jnp
    from pytorchcv_tpu.models.raft import (build_corr_pyramid, lookup_corr,
                                           lookup_corr_gather)

    rs = np.random.RandomState(0)
    b, h, w, c = 2, 16, 24, 32
    f1 = jnp.asarray(rs.randn(b, h, w, c), jnp.float32)
    f2 = jnp.asarray(rs.randn(b, h, w, c), jnp.float32)
    pyramid = build_corr_pyramid(f1, f2, num_levels=4)
    # coords spanning in-range, fractional, and out-of-range positions
    coords = jnp.asarray(rs.rand(b, h, w, 2) * [w + 8, h + 8] - 4.0,
                         jnp.float32)
    got = jax.jit(lambda p, co: lookup_corr(p, co, 4))(pyramid, coords)
    ref = jax.jit(lambda p, co: lookup_corr_gather(p, co, 4))(
        pyramid, coords)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
