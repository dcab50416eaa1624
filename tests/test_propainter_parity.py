"""ProPainter family parity vs the torch reference (video inpainting).

torchvision is absent in this environment, so the reference models (which
import torchvision.ops.DeformConv2d) are instantiated against tv_stub's
pure-torch modulated deformable conv — itself cross-checked against the
TPU-native gather+matmul implementation here."""

import numpy as np
import pytest

from conftest import (add_reference_to_path, has_reference,
                      randomize_stateful_tensors)
from tv_stub import deform_conv2d_ref, install_torchvision_stub

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference repo not mounted")


def test_deform_conv2d_matches_torch_oracle():
    import torch
    import jax.numpy as jnp
    from pytorchcv_tpu.nn.deform import deform_conv2d

    rs = np.random.RandomState(0)
    B, C, H, W, G, K, O = 2, 32, 9, 11, 4, 3, 16
    x = rs.randn(B, C, H, W).astype(np.float32)
    offset = (rs.randn(B, 2 * G * K * K, H, W) * 2).astype(np.float32)
    mask = rs.rand(B, G * K * K, H, W).astype(np.float32)
    w = (rs.randn(O, C, K, K) * 0.1).astype(np.float32)
    bias = rs.randn(O).astype(np.float32)
    with torch.no_grad():
        y_ref = deform_conv2d_ref(
            torch.from_numpy(x), torch.from_numpy(offset),
            torch.from_numpy(mask), torch.from_numpy(w),
            torch.from_numpy(bias), stride=1, padding=1)
    y = deform_conv2d(jnp.asarray(x.transpose(0, 2, 3, 1)),
                      jnp.asarray(offset.transpose(0, 2, 3, 1)),
                      jnp.asarray(mask.transpose(0, 2, 3, 1)),
                      jnp.asarray(w.transpose(2, 3, 1, 0)),
                      jnp.asarray(bias), stride=1, padding=1,
                      deform_groups=G)
    err = np.abs(np.asarray(y).transpose(0, 3, 1, 2) -
                 y_ref.numpy()).max()
    assert err < 1e-4


def test_deform_footprint_equals_general():
    """The default footprint formulation (one (2,2,cg) gather per sample)
    vs the 4-corner oracle, over strides/paddings and far-OOB offsets."""
    import jax.numpy as jnp
    from pytorchcv_tpu.nn.deform import _deform_footprint, _deform_general

    rs = np.random.RandomState(1)
    for stride, padding in [(1, 1), (2, 1), (1, 2)]:
        B, C, H, W, G, K, O = 1, 16, 10, 14, 4, 3, 8
        Ho = (H + 2 * padding - K) // stride + 1
        Wo = (W + 2 * padding - K) // stride + 1
        x = jnp.asarray(rs.randn(B, H, W, C), jnp.float32)
        offset = jnp.asarray(rs.randn(B, Ho, Wo, 2 * G * K * K) * 6,
                             jnp.float32)
        mask = jnp.asarray(rs.rand(B, Ho, Wo, G * K * K), jnp.float32)
        w = jnp.asarray(rs.randn(K, K, C, O) * 0.1, jnp.float32)
        bias = jnp.asarray(rs.randn(O), jnp.float32)
        a = _deform_general(x, offset, mask, w, bias, stride, padding, G)
        b = _deform_footprint(x, offset, mask, w, bias, stride, padding, G)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, err_msg=f"s{stride} p{padding}")


def _convert(model, ref):
    import jax
    import jax.numpy as jnp
    from pytorchcv_tpu.zoo.convert import convert_state_dict

    randomize_stateful_tensors(ref)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = convert_state_dict(sd, model.shape_variables())
    return jax.tree_util.tree_map(jnp.asarray, variables)


def test_propainter_rfc_parity():
    import torch
    import jax.numpy as jnp
    import pytorchcv_tpu as ptc

    install_torchvision_stub()
    add_reference_to_path()
    from pytorchcv.models import propainter_rfc as ref_mod

    torch.manual_seed(0)
    ref = ref_mod.propainter_rfc(pretrained=False, calc_edge=True).eval()
    model = ptc.get_model("propainter_rfc", init=False, calc_edge=True,
                          in_size=(64, 96))
    assert model.num_params() == 5079555
    variables = _convert(model, ref)
    rs = np.random.RandomState(0)
    T, H, W = 4, 64, 96
    mf = rs.randn(1, T, 2, H, W).astype(np.float32)
    mk = rs.rand(1, T, 1, H, W).astype(np.float32)
    with torch.no_grad():
        flow_ref, edge_ref = ref(torch.from_numpy(mf),
                                 torch.from_numpy(mk))
    flow, edge = model.module.apply(
        variables, jnp.asarray(mf.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(mk.transpose(0, 1, 3, 4, 2)), train=False)
    for a, b in [(np.asarray(flow).transpose(0, 1, 4, 2, 3),
                  flow_ref.numpy()),
                 (np.asarray(edge).transpose(0, 1, 4, 2, 3),
                  edge_ref.numpy())]:
        assert np.abs(a - b).max() / (np.abs(b).max() + 1e-9) < 1e-4


def test_propainter_ip_parity():
    import torch
    import jax.numpy as jnp
    import pytorchcv_tpu as ptc

    install_torchvision_stub()
    add_reference_to_path()
    from pytorchcv.models import propainter_ip as ref_mod

    model = ptc.get_model("propainter_ip", init=False, in_size=(64, 96))
    assert model.num_params() == 0
    ref = ref_mod.propainter_ip(pretrained=False).eval()
    rs = np.random.RandomState(0)
    T, H, W = 5, 64, 96
    frames = rs.rand(T, 3, H, W).astype(np.float32)
    masks = (rs.rand(T, 1, H, W) > 0.7).astype(np.float32)
    flows = (rs.randn(T - 1, 4, H, W) * 3).astype(np.float32)
    with torch.no_grad():
        pf_ref, um_ref = ref(torch.from_numpy(frames),
                             torch.from_numpy(masks),
                             torch.from_numpy(flows))
    pf, um = model.module.apply(
        {}, jnp.asarray(frames.transpose(0, 2, 3, 1)),
        jnp.asarray(masks.transpose(0, 2, 3, 1)),
        jnp.asarray(flows.transpose(0, 2, 3, 1)), train=False)
    assert np.abs(np.asarray(pf).transpose(0, 3, 1, 2) -
                  pf_ref.numpy()).max() < 1e-5
    assert np.abs(np.asarray(um).transpose(0, 3, 1, 2) -
                  um_ref.numpy()).max() < 1e-5


def test_propainter_parity():
    import torch
    import jax.numpy as jnp
    import pytorchcv_tpu as ptc

    install_torchvision_stub()
    add_reference_to_path()
    from pytorchcv.models import propainter as ref_mod

    torch.manual_seed(0)
    ref = ref_mod.propainter(pretrained=False).eval()
    model = ptc.get_model("propainter", init=False, in_size=(48, 96))
    assert model.num_params() == 39429667
    variables = _convert(model, ref)
    rs = np.random.RandomState(0)
    B, T, lt, H, W = 1, 6, 4, 48, 96
    mframes = rs.rand(B, T, 3, H, W).astype(np.float32)
    m_upd = (rs.rand(B, T, 1, H, W) > 0.8).astype(np.float32)
    m_in = (rs.rand(B, T, 1, H, W) > 0.7).astype(np.float32)
    cflows = (rs.randn(B, lt - 1, 4, H, W) * 2).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(mframes), torch.from_numpy(m_upd),
                    torch.from_numpy(m_in), torch.from_numpy(cflows), lt)
    y = model.module.apply(
        variables, jnp.asarray(mframes.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(m_upd.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(m_in.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(cflows.transpose(0, 1, 3, 4, 2)), lt, train=False)
    y = np.asarray(y).transpose(0, 1, 4, 2, 3)
    assert y.shape == (B, lt, 3, H, W)
    err = np.abs(y - y_ref.numpy()).max() / (np.abs(y_ref.numpy()).max() +
                                             1e-9)
    assert err < 1e-4


def test_deform_bounded_fast_path_matches_general():
    """The bounded-offset patch+one-hot deform path must match the
    4-gather general path everywhere, including pixels whose sample
    windows straddle the image border (OOB-zero semantics)."""
    import jax.numpy as jnp
    from pytorchcv_tpu.nn.deform import (_deform_general, _deform_patch,
                                         deform_conv2d)

    rs = np.random.RandomState(0)
    b, h, w, c, g, rb = 2, 20, 24, 32, 4, 3.0
    k2 = 9
    x = jnp.asarray(rs.randn(b, h, w, c), jnp.float32)
    kernel = jnp.asarray(rs.randn(3, 3, c, 16) * 0.1, jnp.float32)
    bias = jnp.asarray(rs.randn(16), jnp.float32)
    # center: a large shared shift per pixel; residual bounded by rb
    center = jnp.asarray(rs.randn(b, h, w, 2) * 6.0, jnp.float32)
    resid = jnp.asarray(rs.uniform(-rb, rb, (b, h, w, g, k2, 2)),
                        jnp.float32)
    offset = (resid + center[:, :, :, None, None, :]).reshape(
        b, h, w, g * k2 * 2)
    mask = jnp.asarray(rs.rand(b, h, w, g * k2), jnp.float32)

    ref = _deform_general(x, offset, mask, kernel, bias, 1, 1, g)
    # _deform_patch directly: dispatch no longer routes here (the Pallas
    # window kernel took the bounded fast path; off-TPU deform_conv2d
    # falls through to the measured defaults), but the formulation stays
    # the XLA oracle for the kernel and must remain correct.
    P = 2 * int(np.ceil(rb)) + 4
    got = _deform_patch(x, offset, mask, kernel, bias, g, center, rb, P)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # deform_conv2d with center/bound must stay correct whatever path
    # the dispatch picks (here: CPU -> measured default)
    got_d = deform_conv2d(x, offset, mask, kernel, bias, stride=1,
                          padding=1, deform_groups=g, center=center,
                          residue_bound=rb)
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # tiny images fall back to the general path (patch cannot fit)
    xs = x[:, :8, :8]
    got_small = deform_conv2d(
        xs, offset[:, :8, :8], mask[:, :8, :8], kernel, bias,
        deform_groups=g, center=center[:, :8, :8], residue_bound=rb)
    ref_small = _deform_general(xs, offset[:, :8, :8], mask[:, :8, :8],
                                kernel, bias, 1, 1, g)
    np.testing.assert_allclose(np.asarray(got_small),
                               np.asarray(ref_small), rtol=1e-4,
                               atol=1e-4)
