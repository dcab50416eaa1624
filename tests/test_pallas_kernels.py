"""Pallas kernel numerics: interpret-mode kernels vs their XLA fallbacks.

On CPU the kernels run through the Pallas interpreter, which executes the
same program the Mosaic TPU compiler would — so these tests gate the math
while real-chip performance is gated by the driver benchmark.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorchcv_tpu.kernels import (classification_preprocess,
                                   dwconv2d_bn_act, fused_window_attention,
                                   preprocess_batch, resize_matrices)
from pytorchcv_tpu.kernels.dwconv import _xla_ref as dw_ref
from pytorchcv_tpu.kernels.attention import _xla_ref as attn_ref


class TestPreprocess:
    def test_pallas_matches_xla(self):
        rng = np.random.RandomState(0)
        imgs = rng.randint(0, 256, (2, 64, 80, 3), np.uint8)
        r, c = resize_matrices((64, 80), 32)
        ct = jnp.asarray(c.T)
        r = jnp.asarray(r)
        ref = preprocess_batch(imgs, r, ct, out_dtype=jnp.float32,
                               use_pallas=False)
        out = preprocess_batch(imgs, r, ct, out_dtype=jnp.float32,
                               use_pallas=False, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)
        assert out.shape == (2, 32, 32, 3)

    def test_nchw_layout(self):
        """layout='nchw' emits the planar form of the same values on both
        the einsum and Pallas paths (the int8 pipelines consume it)."""
        rng = np.random.RandomState(1)
        imgs = rng.randint(0, 256, (2, 64, 80, 3), np.uint8)
        r, c = resize_matrices((64, 80), 32)
        r, ct = jnp.asarray(r), jnp.asarray(c.T)
        ref = preprocess_batch(imgs, r, ct, out_dtype=jnp.float32,
                               use_pallas=False)
        for kw in ({"use_pallas": False}, {"use_pallas": False,
                                           "interpret": True}):
            out = preprocess_batch(imgs, r, ct, out_dtype=jnp.float32,
                                   layout="nchw", **kw)
            assert out.shape == (2, 3, 32, 32)
            np.testing.assert_allclose(
                np.asarray(out).transpose(0, 2, 3, 1), np.asarray(ref),
                atol=1e-4, rtol=1e-4)

    def test_matches_pil_torchvision_protocol(self):
        """Full protocol parity vs PIL resize + center-crop + normalize
        (the reference eval stack, README.md:157-167)."""
        PIL = pytest.importorskip("PIL.Image")
        rng = np.random.RandomState(1)
        img = rng.randint(0, 256, (100, 120, 3), np.uint8)
        crop, scale = 56, 0.875
        resize_value = int(round(crop / scale))  # 64, short side = H
        pil = PIL.fromarray(img)
        # torchvision truncates the long side (not round):
        # _compute_resized_output_size -> int(size * long / short).
        rw = int(120 * resize_value / 100)
        pil = pil.resize((rw, resize_value), PIL.BILINEAR)
        arr = np.asarray(pil).astype(np.float32)
        top = (resize_value - crop) // 2
        left = (rw - crop) // 2
        arr = arr[top:top + crop, left:left + crop]
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        expect = (arr / 255.0 - mean) / std

        r, c = resize_matrices((100, 120), crop, scale)
        got = preprocess_batch(img[None], jnp.asarray(r), jnp.asarray(c.T),
                               out_dtype=jnp.float32, use_pallas=False)[0]
        # PIL quantizes filter weights to 8.8 fixed point and clips uint8;
        # tolerance covers that quantization.
        np.testing.assert_allclose(np.asarray(got), expect, atol=0.04)

    def test_resize_long_side_truncates(self):
        """torchvision truncates the resized long side; round() drifts the
        resize width on e.g. 353x500 (500*256/353 = 362.6 -> 362 not 363)."""
        from pytorchcv_tpu.kernels.preprocess import _pil_bilinear_matrix
        r, c = resize_matrices((353, 500), 224, 0.875)
        assert r.shape == (224, 353) and c.shape == (224, 500)
        expect = _pil_bilinear_matrix(500, 362)[(362 - 224) // 2:][:224]
        np.testing.assert_allclose(c, expect, atol=1e-7)

    def test_segmentation_preprocess(self):
        from pytorchcv_tpu.kernels.preprocess import segmentation_preprocess
        run = segmentation_preprocess((32, 48), (50, 70),
                                      out_dtype=jnp.float32,
                                      use_pallas=False)
        out = run(np.zeros((2, 50, 70, 3), np.uint8))
        assert out.shape == (2, 32, 48, 3)
        np.testing.assert_allclose(
            np.asarray(out)[0, 0, 0],
            (-np.array([0.485, 0.456, 0.406]) /
             np.array([0.229, 0.224, 0.225])), atol=1e-5)

    def test_classification_preprocess_closure(self):
        run = classification_preprocess(32, (48, 48), out_dtype=jnp.float32,
                                        use_pallas=False)
        out = run(np.zeros((1, 48, 48, 3), np.uint8))
        assert out.shape == (1, 32, 32, 3)
        # all-zero uint8 -> exactly -mean/std
        np.testing.assert_allclose(
            np.asarray(out)[0, 0, 0],
            (-np.array([0.485, 0.456, 0.406]) /
             np.array([0.229, 0.224, 0.225])), atol=1e-5)


class TestStemConv:
    @staticmethod
    def _int8_reference(x, k7, gain, bias, s_img, s_out):
        """The int8 math the kernel implements, via plain XLA ops."""
        k = np.asarray(k7, np.float32)
        s_w = np.maximum(np.abs(k).max(axis=(0, 1, 2)), 1e-12) / 127.0
        wq = jnp.asarray(np.clip(np.round(k / s_w), -127, 127), jnp.int8)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (127.0 / s_img)),
                      -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, wq, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        y = y * (jnp.asarray(s_w) * gain * (s_img / 127.0)) + bias
        y = jnp.maximum(y, 0.0)
        return jnp.clip(jnp.round(y * (127.0 / s_out)),
                        -127, 127).astype(jnp.int8)

    def test_interpret_exactness(self):
        """Banded-matmul stem: bit-exact vs the equivalent int8 XLA chain
        (interpret mode; real-chip parity checked by the TPU benchmark)."""
        from pytorchcv_tpu.kernels.stem_conv import stem_conv7x7_s2
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
        k7 = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.1, jnp.float32)
        gain = jnp.asarray(rng.rand(64) + 0.5, jnp.float32)
        bias = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)
        refq = self._int8_reference(x, k7, gain, bias, 2.0, 4.0)
        got = stem_conv7x7_s2(x, k7, gain, bias, 2.0, 4.0, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(refq))


class TestDwconv:
    @pytest.mark.parametrize("stride,k,c,h,w", [
        (1, 3, 16, 12, 12),
        (2, 3, 24, 14, 14),
        (1, 5, 8, 11, 13),
        (2, 5, 32, 16, 18),
        (1, 7, 8, 14, 14),
    ])
    def test_matches_xla(self, stride, k, c, h, w):
        rng = np.random.RandomState(k + stride)
        x = jnp.asarray(rng.randn(2, h, w, c), jnp.float32)
        wgt = jnp.asarray(rng.randn(k, k, c) * 0.2, jnp.float32)
        scale = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
        shift = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
        pad = ((k // 2, k // 2), (k // 2, k // 2))
        ref = dw_ref(x, wgt, scale, shift, stride, pad, "relu6")
        got = dwconv2d_bn_act(x, wgt, scale, shift, stride, pad, "relu6",
                              use_pallas=False, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    @pytest.mark.parametrize("act", ["none", "relu", "hswish", "swish"])
    def test_activations(self, act):
        rng = np.random.RandomState(7)
        x = jnp.asarray(rng.randn(1, 8, 8, 8), jnp.float32)
        wgt = jnp.asarray(rng.randn(3, 3, 8) * 0.3, jnp.float32)
        one = jnp.ones(8, jnp.float32)
        zero = jnp.zeros(8, jnp.float32)
        pad = ((1, 1), (1, 1))
        ref = dw_ref(x, wgt, one, zero, 1, pad, act)
        got = dwconv2d_bn_act(x, wgt, one, zero, 1, pad, act,
                              use_pallas=False, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_grad_flows_through_custom_vjp(self):
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(1, 8, 8, 8), jnp.float32)
        wgt = jnp.asarray(rng.randn(3, 3, 8) * 0.3, jnp.float32)
        scale = jnp.ones(8, jnp.float32)
        shift = jnp.zeros(8, jnp.float32)
        pad = ((1, 1), (1, 1))

        def loss(x_, w_):
            return dwconv2d_bn_act(x_, w_, scale, shift, 1, pad, "relu",
                                   use_pallas=False).sum()

        gx, gw = jax.grad(loss, argnums=(0, 1))(x, wgt)

        def loss_ref(x_, w_):
            return dw_ref(x_, w_, scale, shift, 1, pad, "relu").sum()

        rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, wgt)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=1e-5)


class TestWindowAttention:
    def test_matches_xla(self):
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(2, 3, 45, 32), jnp.float32)
        k = jnp.asarray(rng.randn(2, 3, 90, 32), jnp.float32)
        v = jnp.asarray(rng.randn(2, 3, 90, 32), jnp.float32)
        ref = attn_ref(q, k, v, 32 ** -0.5, None)
        got = fused_window_attention(q, k, v, use_pallas=False,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_mask(self):
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.randn(2, 16, 16), jnp.float32)
        k = jnp.asarray(rng.randn(2, 24, 16), jnp.float32)
        v = jnp.asarray(rng.randn(2, 24, 16), jnp.float32)
        mask = jnp.where(rng.rand(2, 16, 24) > 0.5, 0.0, -1e9).astype(
            jnp.float32)
        ref = attn_ref(q, k, v, 0.25, mask)
        got = fused_window_attention(q, k, v, scale=0.25, mask=mask,
                                     use_pallas=False, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_grad(self):
        rng = np.random.RandomState(2)
        q = jnp.asarray(rng.randn(1, 8, 16), jnp.float32)
        k = jnp.asarray(rng.randn(1, 12, 16), jnp.float32)
        v = jnp.asarray(rng.randn(1, 12, 16), jnp.float32)

        g = jax.grad(lambda q_: fused_window_attention(
            q_, k, v, use_pallas=False).sum())(q)
        r = jax.grad(lambda q_: attn_ref(q_, k, v, 16 ** -0.5, None).sum())(q)
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-5)

    def test_flash_attention_parity(self):
        from pytorchcv_tpu.kernels import flash_attention
        rng = np.random.RandomState(5)
        q = jnp.asarray(rng.randn(2, 256, 64), jnp.float32)
        k = jnp.asarray(rng.randn(2, 320, 64), jnp.float32)
        v = jnp.asarray(rng.randn(2, 320, 96), jnp.float32)
        ref = attn_ref(q, k, v, 1.0, None)
        got = flash_attention(q, k, v, 1.0, use_pallas=False,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_flash_attention_grad_and_scale(self):
        from pytorchcv_tpu.kernels import flash_attention
        rng = np.random.RandomState(6)
        q = jnp.asarray(rng.randn(1, 64, 32), jnp.float32)
        g = jax.grad(lambda q_: flash_attention(
            q_, q, q, 0.5, False, False).sum())(q)
        r = jax.grad(lambda q_: attn_ref(q_, q, q, 0.5, None).sum())(q)
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-4)

    def test_flash_unalignable_length_falls_back(self):
        from pytorchcv_tpu.kernels import flash_attention
        rng = np.random.RandomState(7)
        q = jnp.asarray(rng.randn(1, 63, 32), jnp.float32)  # prime-ish L
        out = flash_attention(q, q, q, 1.0, use_pallas=True)
        ref = attn_ref(q, q, q, 1.0, None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_big_window_falls_back(self):
        # 2048x2048 scores exceed the VMEM budget -> XLA path, same result.
        rng = np.random.RandomState(3)
        q = jnp.asarray(rng.randn(1, 2048, 16), jnp.float32)
        out = fused_window_attention(q, q, q, use_pallas=True)
        ref = attn_ref(q, q, q, 16 ** -0.5, None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


class TestFusedBottleneck:
    """Interpret-mode bit-exactness of the fused int8 bottleneck chain
    against the quant/resnet_int8 _cell segment it replays (the kernel is
    kept unwired — measured slower than XLA on v5e — but its math is the
    canonical fused formulation; see kernels/fused_bottleneck.py)."""

    def test_bit_exact_vs_cell_chain(self):
        from pytorchcv_tpu.kernels.fused_bottleneck import (
            fused_bottleneck_chain, fused_chain_xla_ref, pack_units)
        rng = np.random.default_rng(0)
        h, w, c, m, n_units, bsz = 4, 8, 128, 128, 2, 2

        def mk_cell(cin, cout, k):
            kern = (rng.standard_normal((k, k, cin, cout))
                    .astype(np.float32) * 0.05)
            s_w = np.maximum(np.max(np.abs(kern), axis=(0, 1, 2)),
                             1e-12) / 127.0
            wq = np.clip(np.round(kern / s_w), -127, 127).astype(np.int8)
            return {"wq": jnp.asarray(wq),
                    "gain": jnp.asarray((s_w * rng.uniform(0.5, 1.5, cout))
                                        .astype(np.float32)),
                    "bias": jnp.asarray((rng.standard_normal(cout) * 0.1)
                                        .astype(np.float32))}

        units = [{"conv1": mk_cell(c, m, 1), "conv2": mk_cell(m, m, 3),
                  "conv3": mk_cell(m, c, 1)} for _ in range(n_units)]
        s_chain = [2.5] + [1.8, 2.1, 2.4] * n_units
        xq = jnp.asarray(rng.integers(-127, 128, (bsz, h, w, c),
                                      dtype=np.int8))
        ref = fused_chain_xla_ref(xq, units, s_chain, h, w)
        out = fused_bottleneck_chain(xq, pack_units(units, s_chain),
                                     h, w, interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestDeformPatch:
    """Interpret-mode parity of the Pallas bounded-offset window sampler
    (kernels/deform_patch.py) against both XLA formulations in
    nn/deform.py — including pixels whose windows straddle the border
    (OOB-zero) and W not a multiple of the 8-lane tile."""

    def test_matches_general_and_patch(self):
        from pytorchcv_tpu.kernels.deform_patch import deform_sample_patch
        from pytorchcv_tpu.nn.deform import _deform_general, _deform_patch
        import math as _math

        rs = np.random.RandomState(0)
        h, w, c, g, rb = 19, 27, 32, 4, 2.5   # n=513: exercises tile pad
        k2 = 9
        P = 2 * _math.ceil(rb) + 4
        x = jnp.asarray(rs.randn(1, h, w, c), jnp.float32)
        kernel = jnp.asarray(rs.randn(3, 3, c, 16) * 0.1, jnp.float32)
        bias = jnp.asarray(rs.randn(16), jnp.float32)
        center = jnp.asarray(rs.randn(1, h, w, 2) * 6.0, jnp.float32)
        resid = jnp.asarray(rs.uniform(-rb, rb, (1, h, w, g, k2, 2)),
                            jnp.float32)
        offset = (resid + center[:, :, :, None, None, :]).reshape(
            1, h, w, g * k2 * 2)
        mask = jnp.asarray(rs.rand(1, h, w, g * k2), jnp.float32)

        sampled = deform_sample_patch(x, offset, mask, g, center, rb, P,
                                      interpret=True)
        got = sampled @ kernel.reshape(9 * c, 16) + bias
        ref = _deform_general(x, offset, mask, kernel, bias, 1, 1, g)
        ref2 = _deform_patch(x, offset, mask, kernel, bias, g, center,
                             rb, P)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref2),
                                   rtol=1e-4, atol=1e-4)

    def test_bf16_window_positions_stay_f32(self):
        """bf16 data must still sample at f32-exact positions (the
        regression class tests/test_sampling_precision.py guards for
        the XLA paths)."""
        from pytorchcv_tpu.kernels.deform_patch import deform_sample_patch
        from pytorchcv_tpu.nn.deform import _deform_patch
        import math as _math

        rs = np.random.RandomState(1)
        h, w, c, g, rb = 16, 24, 16, 2, 3.0
        k2 = 9
        P = 2 * _math.ceil(rb) + 4
        xf = rs.randn(1, h, w, c).astype(np.float32)
        x = jnp.asarray(xf, jnp.bfloat16)
        kernel = jnp.asarray(rs.randn(3, 3, c, 8) * 0.1, jnp.bfloat16)
        center = jnp.asarray(rs.randn(1, h, w, 2) * 4.0, jnp.float32)
        resid = jnp.asarray(rs.uniform(-rb, rb, (1, h, w, g, k2, 2)),
                            jnp.float32)
        offset = (resid + center[:, :, :, None, None, :]).reshape(
            1, h, w, g * k2 * 2)
        mask = jnp.asarray(rs.rand(1, h, w, g * k2), jnp.float32)

        sampled = deform_sample_patch(x, offset, mask, g, center, rb, P,
                                      interpret=True)
        got = np.asarray(sampled @ kernel.reshape(9 * c, 8),
                         dtype=np.float32)
        ref = np.asarray(_deform_patch(x, offset, mask, kernel, None, g,
                                       center, rb, P), dtype=np.float32)
        scale = np.abs(ref).max() + 1e-9
        assert np.abs(got - ref).max() / scale < 0.05
