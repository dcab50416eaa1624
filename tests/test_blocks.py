"""Unit tier: block vocabulary vs torch on small tensors (pooling geometry,
shuffles, pixel shuffle, conv/deconv padding semantics)."""

import numpy as np
import pytest

from conftest import has_reference


def _rand(*shape):
    return np.random.RandomState(0).randn(*shape).astype(np.float32)


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


@pytest.mark.parametrize("k,s,p,ceil", [
    (3, 2, 1, False), (2, 2, 0, False), (3, 2, 0, True), (3, 1, 1, False),
    (3, 2, 1, True),
])
def test_max_pool2d_vs_torch(k, s, p, ceil):
    import torch
    import jax.numpy as jnp
    from pytorchcv_tpu.nn import max_pool2d

    x = _rand(2, 4, 11, 13)
    ref = torch.nn.MaxPool2d(k, stride=s, padding=p, ceil_mode=ceil)(
        torch.from_numpy(x)).numpy()
    out = np.asarray(max_pool2d(k, s, p, ceil_mode=ceil)(
        jnp.asarray(to_nhwc(x))))
    np.testing.assert_allclose(to_nchw(out), ref, rtol=1e-6)


@pytest.mark.parametrize("k,s,p", [(3, 2, 1), (2, 2, 0), (7, 1, 0)])
def test_avg_pool2d_vs_torch(k, s, p):
    import torch
    import jax.numpy as jnp
    from pytorchcv_tpu.nn import avg_pool2d

    x = _rand(2, 4, 12, 14)
    ref = torch.nn.AvgPool2d(k, stride=s, padding=p)(
        torch.from_numpy(x)).numpy()
    out = np.asarray(avg_pool2d(k, s, p)(jnp.asarray(to_nhwc(x))))
    np.testing.assert_allclose(to_nchw(out), ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("out_size", [1, 2, 3, 6, (2, 3)])
def test_adaptive_avg_pool2d_vs_torch(out_size):
    import torch
    import jax.numpy as jnp
    from pytorchcv_tpu.nn import adaptive_avg_pool2d

    x = _rand(2, 5, 13, 17)
    ref = torch.nn.AdaptiveAvgPool2d(out_size)(torch.from_numpy(x)).numpy()
    out = np.asarray(adaptive_avg_pool2d(out_size)(jnp.asarray(to_nhwc(x))))
    np.testing.assert_allclose(to_nchw(out), ref, rtol=1e-5, atol=1e-6)


def test_pixel_shuffle_vs_torch():
    import torch
    import jax.numpy as jnp
    from pytorchcv_tpu.nn import pixel_shuffle

    x = _rand(2, 12, 5, 7)
    ref = torch.nn.PixelShuffle(2)(torch.from_numpy(x)).numpy()
    out = np.asarray(pixel_shuffle(jnp.asarray(to_nhwc(x)), 2))
    np.testing.assert_allclose(to_nchw(out), ref, rtol=1e-6)


def test_channel_shuffle_vs_reference_semantics():
    import jax.numpy as jnp
    from pytorchcv_tpu.nn import channel_shuffle

    # NCHW reference semantics: view(g, c/g) transpose -> index i*g+gidx
    x = _rand(1, 6, 2, 2)
    ref = x.reshape(1, 2, 3, 2, 2).transpose(0, 2, 1, 3, 4).reshape(
        1, 6, 2, 2)
    out = np.asarray(channel_shuffle(jnp.asarray(to_nhwc(x)), 2))
    np.testing.assert_allclose(to_nchw(out), ref, rtol=1e-6)


def test_interpolate_bilinear_align_corners_vs_torch():
    import torch
    import jax.numpy as jnp
    from pytorchcv_tpu.nn import interpolate

    x = _rand(2, 3, 8, 8)
    for align in (True, False):
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=(17, 23), mode="bilinear",
            align_corners=align).numpy()
        out = np.asarray(interpolate(jnp.asarray(to_nhwc(x)), (17, 23),
                                     align_corners=align))
        np.testing.assert_allclose(to_nchw(out), ref, rtol=1e-4, atol=1e-5)


def test_deconv_block_vs_torch():
    import torch
    import jax
    import jax.numpy as jnp
    from pytorchcv_tpu.nn import ConvTranspose2d

    x = _rand(1, 4, 7, 9)
    ref_deconv = torch.nn.ConvTranspose2d(4, 6, kernel_size=4, stride=2,
                                          padding=1, bias=True)
    with torch.no_grad():
        ref = ref_deconv(torch.from_numpy(x)).numpy()
    w = ref_deconv.weight.detach().numpy()        # (I, O, kH, kW)
    b = ref_deconv.bias.detach().numpy()
    mod = ConvTranspose2d(out_channels=6, kernel_size=4, stride=2, padding=1,
                          bias=True)
    # stored layout: (kH, kW, O, I) == torch weight (I, O, kH, kW) via the
    # same (2, 3, 1, 0) transpose every conv uses
    variables = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                            "bias": jnp.asarray(b)}}
    out = np.asarray(mod.apply(variables, jnp.asarray(to_nhwc(x))))
    np.testing.assert_allclose(to_nchw(out), ref, rtol=1e-4, atol=1e-5)


def test_heatmap_max_det_matches_reference_loop():
    import jax.numpy as jnp
    from pytorchcv_tpu.nn import HeatmapMaxDetBlock

    rng = np.random.RandomState(1)
    hm = rng.rand(2, 8, 9, 5).astype(np.float32)  # NHWC
    out = np.asarray(HeatmapMaxDetBlock().apply({}, jnp.asarray(hm)))
    # replicate reference tutti.py:408 double loop
    hm_nchw = np.transpose(hm, (0, 3, 1, 2))
    b, k, h, w = hm_nchw.shape
    for bi in range(b):
        for ki in range(k):
            plane = hm_nchw[bi, ki]
            idx = plane.argmax()
            score = plane.max()
            px, py = int(idx % w), int(idx // w)
            fx, fy = float(px), float(py)
            if 0 < px < w - 1 and 0 < py < h - 1:
                fx += np.sign(plane[py, px + 1] - plane[py, px - 1]) * 0.25
                fy += np.sign(plane[py + 1, px] - plane[py - 1, px]) * 0.25
            np.testing.assert_allclose(out[bi, ki],
                                       [fx, fy, score], rtol=1e-5)
