"""int8 PTQ: generic interception quantizer + the ResNet serving pipeline.

Gates: calibration coverage, logits agreement vs the f32 model (cosine +
top-1), and structural details (space-to-depth stem exactness).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorchcv_tpu as ptc
from pytorchcv_tpu.quant import calibrate_int8, int8_apply_fn, quantize_model
from pytorchcv_tpu.quant.resnet_int8 import (_space_to_depth_stem,
                                             int8_resnet_apply_fn,
                                             prepare_int8_resnet)


def _agreement(y8, yf):
    """Cosine + top-1 agreement over samples with a decisive top-2
    margin (random-weight logits are often near-tied; int8/bf16 rounding
    legitimately flips those without being a math error)."""
    y8 = y8.astype(jnp.float32)
    cos = float(jnp.sum(y8 * yf) /
                (jnp.linalg.norm(y8) * jnp.linalg.norm(yf)))
    top2 = jax.lax.top_k(yf, 2)[0]
    margin = (top2[:, 0] - top2[:, 1]) / (
        jnp.max(jnp.abs(yf), axis=1) + 1e-9)
    decisive = margin > 0.02
    same = (jnp.argmax(y8, 1) == jnp.argmax(yf, 1)) | ~decisive
    agree = float(jnp.mean(same))
    return cos, agree


class TestGenericPTQ:
    def test_resnet10_parity(self):
        model = ptc.get_model("resnet10", in_size=(64, 64))
        fn, scales = quantize_model(model, batch=4)
        assert len(scales) >= 10          # every dense conv calibrated
        x = jax.random.uniform(jax.random.PRNGKey(1), (4, 64, 64, 3))
        y8 = jax.jit(fn)(model.variables, x)
        yf = model(x)
        cos, agree = _agreement(y8, yf)
        assert cos > 0.995 and agree == 1.0, (cos, agree)

    def test_default_calibration_deployment_domain(self):
        """quantize_model's DEFAULT calibration must produce
        deployment-grade scales for ImageNet-normalized inputs (VERDICT
        r2 item 5: the old uniform-[0,1) default measured 60% peak logit
        error / 0.72 raw argmax agreement on this exact check; the
        normalized-domain default measures 1.9% / 0.92)."""
        model = ptc.get_model("resnet10", in_size=(64, 64))
        fn, _ = quantize_model(model, batch=8, n_calib=2)
        u8 = jax.random.randint(jax.random.PRNGKey(1), (64, 64, 64, 3),
                                0, 256, jnp.int32)
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        x = (u8.astype(jnp.float32) / 255.0 - mean) / std
        q = jax.jit(fn)(model.variables, x)
        f = model(x)
        rel = float(jnp.max(jnp.abs(q.astype(jnp.float32) - f)) /
                    (jnp.max(jnp.abs(f)) + 1e-9))
        cos, agree = _agreement(q, f)
        assert rel < 0.05, rel
        assert cos > 0.995 and agree > 0.9, (cos, agree)

    def test_depthwise_stays_float(self):
        # mobilenet: depthwise convs must NOT be calibrated (grouped).
        model = ptc.get_model("mobilenet_wd4", in_size=(64, 64))
        calib = [jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))]
        scales = calibrate_int8(model, calib)
        assert scales, "pointwise convs should calibrate"
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
        y8 = jax.jit(int8_apply_fn(model, scales))(model.variables, x)
        yf = model(x)
        cos, agree = _agreement(y8, yf)
        assert cos > 0.99, cos


class TestResnetInt8Pipeline:
    @pytest.mark.parametrize("name", ["resnet10", "resnet18", "resnet50",
                                      "resnet50b", "seresnet18",
                                      "seresnet50", "resnext50_32x4d",
                                      "senet16"])
    def test_parity(self, name):
        model = ptc.get_model(name, in_size=(64, 64))
        calib = [jax.random.uniform(jax.random.PRNGKey(i), (4, 64, 64, 3))
                 for i in range(2)]
        scales = calibrate_int8(model, calib)
        fn, qtree = prepare_int8_resnet(model, scales)
        x = jax.random.uniform(jax.random.PRNGKey(9), (4, 64, 64, 3))
        y8 = jax.jit(fn)(qtree, x)
        yf = model(x)
        cos, agree = _agreement(y8, yf)
        assert cos > 0.995 and agree == 1.0, (name, cos, agree)

    def test_planar_input_bit_exact(self):
        """The pipeline accepts the serving boundary's planar (B,3,H,W)
        layout (the Pallas preprocess's native emission) and must match
        the NHWC path bit-exactly — same folded stem math, NCHW conv +
        pool, transpose after the small pooled tensor."""
        model = ptc.get_model("resnet10", in_size=(64, 64))
        calib = [jax.random.uniform(jax.random.PRNGKey(0), (4, 64, 64, 3))]
        scales = calibrate_int8(model, calib)
        fn, qtree = prepare_int8_resnet(model, scales)
        x = jax.random.uniform(jax.random.PRNGKey(9), (4, 64, 64, 3))
        y_nhwc = jax.jit(fn)(qtree, x)
        y_nchw = jax.jit(fn)(qtree, jnp.transpose(x, (0, 3, 1, 2)))
        assert np.array_equal(np.asarray(y_nhwc, np.float32),
                              np.asarray(y_nchw, np.float32))

    def test_mobilenet_int8_storage_parity(self):
        """int8-storage inverted-residual pipeline vs the bf16 model."""
        from pytorchcv_tpu.quant.mobilenet_int8 import (
            is_mobilenet_v2_tree, prepare_int8_mobilenet)
        for name in ("mobilenetv2_wd2", "mobilenetv2b_wd2"):
            model = ptc.get_model(name, in_size=(64, 64))
            assert is_mobilenet_v2_tree(model.variables), name
            calib = [jax.random.uniform(jax.random.PRNGKey(i),
                                        (4, 64, 64, 3)) for i in range(2)]
            scales = calibrate_int8(model, calib)
            fn, qtree = prepare_int8_mobilenet(model, scales)
            x = jax.random.uniform(jax.random.PRNGKey(9), (4, 64, 64, 3))
            y8 = jax.jit(fn)(qtree, x)
            yf = model(x)
            cos, agree = _agreement(y8, yf)
            # random-init weights quantize worse than trained ones; the
            # plain-v2 case holds >0.99, v2b (no expand conv on unit1)
            # lands ~0.988 at 64x64.
            assert cos > 0.985, (name, cos)
        assert not is_mobilenet_v2_tree(
            ptc.get_model("resnet10", in_size=(64, 64)).variables)

    def test_mobilenet_v1_int8_storage_parity(self):
        """v1 depthwise-separable int8-storage pipeline vs bf16."""
        from pytorchcv_tpu.quant.mobilenet_int8 import (
            is_mobilenet_v1_tree, prepare_int8_mobilenet_v1)
        for name in ("mobilenet_wd2", "fdmobilenet_wd2"):
            model = ptc.get_model(name, in_size=(64, 64))
            assert is_mobilenet_v1_tree(model.variables), name
            calib = [jax.random.uniform(jax.random.PRNGKey(i),
                                        (4, 64, 64, 3)) for i in range(2)]
            scales = calibrate_int8(model, calib)
            fn, qtree = prepare_int8_mobilenet_v1(model, scales)
            x = jax.random.uniform(jax.random.PRNGKey(9), (4, 64, 64, 3))
            y8 = jax.jit(fn)(qtree, x)
            yf = model(x)
            cos, agree = _agreement(y8, yf)
            assert cos > 0.985, (name, cos)

    def test_vgg_int8_storage_parity(self):
        """VGG int8-storage pipeline (conv stacks + int8 fc head) vs
        bf16, across all three parameterizations (bias / bn / bn+bias)."""
        from pytorchcv_tpu.quant.vgg_int8 import (is_plain_vgg,
                                                  prepare_int8_vgg)
        for name in ("vgg11", "bn_vgg11", "bn_vgg11b"):
            model = ptc.get_model(name, in_size=(64, 64))
            assert is_plain_vgg(model.variables), name
            calib = [jax.random.uniform(jax.random.PRNGKey(i),
                                        (4, 64, 64, 3)) for i in range(2)]
            scales = calibrate_int8(model, calib)
            assert "output/fc1/fc" in scales and "output/fc3" in scales
            fn, qtree = prepare_int8_vgg(model, scales)
            x = jax.random.uniform(jax.random.PRNGKey(9), (4, 64, 64, 3))
            y8 = jax.jit(fn)(qtree, x)
            yf = model(x)
            cos, agree = _agreement(y8, yf)
            assert cos > 0.98 and agree == 1.0, (name, cos, agree)
        assert not is_plain_vgg(
            ptc.get_model("resnet10", in_size=(64, 64)).variables)
        assert not is_plain_vgg(
            ptc.get_model("alexnet", in_size=(224, 224)).variables)

    def test_darknet_int8_storage_parity(self):
        """DarkNet-53 int8-storage pipeline (leaky-ReLU cells, bf16
        residual adds) vs the bf16 model."""
        from pytorchcv_tpu.quant.darknet_int8 import (is_darknet53_tree,
                                                      prepare_int8_darknet)
        model = ptc.get_model("darknet53", in_size=(64, 64))
        assert is_darknet53_tree(model.variables)
        calib = [jax.random.uniform(jax.random.PRNGKey(i), (4, 64, 64, 3))
                 for i in range(2)]
        scales = calibrate_int8(model, calib)
        fn, qtree = prepare_int8_darknet(model, scales)
        x = jax.random.uniform(jax.random.PRNGKey(9), (4, 64, 64, 3))
        y8 = jax.jit(fn)(qtree, x)
        yf = model(x)
        cos, agree = _agreement(y8, yf)
        assert cos > 0.985 and agree == 1.0, (cos, agree)
        assert not is_darknet53_tree(
            ptc.get_model("resnet10", in_size=(64, 64)).variables)
        assert not is_darknet53_tree(
            ptc.get_model("darknet_tiny", in_size=(64, 64)).variables)

    def test_jasper_int8_storage_parity(self):
        """Jasper/JasperDR int8-storage ASR pipeline (length-masked 1D
        convs, plain + dense residuals) vs the f32 model."""
        from pytorchcv_tpu.model import Model
        from pytorchcv_tpu.models.jasper import get_jasper
        from pytorchcv_tpu.quant.jasper_int8 import (is_plain_jasper,
                                                     prepare_int8_jasper)
        cases = [
            ptc.get_model("jasper5x3", from_audio=False),
            Model(name="jasperdr5x1_test",
                  module=get_jasper(("jasper", "5x1"), use_dr=True,
                                    from_audio=False)).init(0),
        ]
        for model in cases:
            assert is_plain_jasper(model), model.name
            B, T, C = 2, 128, 64
            x = 2.0 * jax.random.normal(jax.random.PRNGKey(0), (B, T, C))
            x_len = jnp.array([T, T - 21], jnp.int32)
            scales = calibrate_int8(model, [(x, x_len)])
            assert "features/init_block/conv" in scales and \
                "output" in scales, sorted(scales)[:4]
            fn, qtree = prepare_int8_jasper(model, scales)
            y8, l8 = jax.jit(fn)(qtree, x, x_len)
            yf, lf = model(x, x_len)
            assert np.array_equal(np.asarray(l8), np.asarray(lf)), model.name
            valid = np.arange(y8.shape[1])[None, :] < np.asarray(l8)[:, None]
            a = np.asarray(y8, np.float32)[valid].ravel()
            b = np.asarray(yf, np.float32)[valid].ravel()
            cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            assert cos > 0.99, (model.name, cos)
        # QuartzNet (depthwise trunk) must NOT route here: bf16 measured
        # faster for dw families (quant/jasper_int8.py docstring).
        assert not is_plain_jasper(
            ptc.get_model("quartznet5x5_en_ls", from_audio=False))

    def test_mobilenetv3_int8_storage_parity(self):
        """MobileNetV3 int8-storage (relu/hswish mix, hsigmoid SE)."""
        from pytorchcv_tpu.quant.mobilenetv3_int8 import (
            is_mobilenetv3_module, prepare_int8_mobilenetv3)
        for name in ("mobilenetv3_small_w1", "mobilenetv3_large_w1"):
            model = ptc.get_model(name, in_size=(64, 64))
            assert is_mobilenetv3_module(model), name
            calib = [jax.random.uniform(jax.random.PRNGKey(i),
                                        (4, 64, 64, 3)) for i in range(2)]
            scales = calibrate_int8(model, calib)
            fn, qtree = prepare_int8_mobilenetv3(model, scales)
            x = jax.random.uniform(jax.random.PRNGKey(9), (4, 64, 64, 3))
            y8 = jax.jit(fn)(qtree, x)
            yf = model(x)
            cos, agree = _agreement(y8, yf)
            assert cos > 0.98, (name, cos)
        assert not is_mobilenetv3_module(
            ptc.get_model("mobilenetv2_wd2", in_size=(64, 64)))

    def test_efficientnet_int8_storage_parity(self):
        """MBConv int8-storage pipeline (swish + SE) vs the bf16 model."""
        from pytorchcv_tpu.quant.efficientnet_int8 import (
            is_efficientnet_module, prepare_int8_efficientnet)
        model = ptc.get_model("efficientnet_b0", in_size=(64, 64))
        assert is_efficientnet_module(model)
        calib = [jax.random.uniform(jax.random.PRNGKey(i), (4, 64, 64, 3))
                 for i in range(2)]
        scales = calibrate_int8(model, calib)
        fn, qtree = prepare_int8_efficientnet(model, scales)
        x = jax.random.uniform(jax.random.PRNGKey(9), (4, 64, 64, 3))
        y8 = jax.jit(fn)(qtree, x)
        yf = model(x)
        cos, agree = _agreement(y8, yf)
        assert cos > 0.98, cos
        assert not is_efficientnet_module(
            ptc.get_model("efficientnet_b0b", in_size=(64, 64)))  # tf_mode

    def test_group_merge_exactness(self):
        """Block-diagonal group merge (ResNeXt/SENet MXU fix) must be
        numerically identical to the unmerged grouped conv — the off-block
        weights are zeros, so the int32 sums are the same."""
        model = ptc.get_model("resnext14_32x4d", in_size=(64, 64))
        calib = [jax.random.uniform(jax.random.PRNGKey(0), (4, 64, 64, 3))]
        scales = calibrate_int8(model, calib)
        x = jax.random.uniform(jax.random.PRNGKey(9), (2, 64, 64, 3))
        fn_m, qt_m = prepare_int8_resnet(model, scales, group_block=32)
        fn_u, qt_u = prepare_int8_resnet(model, scales, group_block=None)
        ym = np.asarray(jax.jit(fn_m)(qt_m, x), np.float32)
        yu = np.asarray(jax.jit(fn_u)(qt_u, x), np.float32)
        np.testing.assert_array_equal(ym, yu)
        # merged kernels really are wider
        w2m = qt_m["features"]["stage1"]["unit1"]["body"]["conv2"]["wq"]
        w2u = qt_u["features"]["stage1"]["unit1"]["body"]["conv2"]["wq"]
        assert w2m.shape[2] > w2u.shape[2]

    def test_in_graph_variant_matches_prepared(self):
        model = ptc.get_model("resnet10", in_size=(64, 64))
        calib = [jax.random.uniform(jax.random.PRNGKey(0), (4, 64, 64, 3))]
        scales = calibrate_int8(model, calib)
        x = jax.random.uniform(jax.random.PRNGKey(9), (2, 64, 64, 3))
        y1 = jax.jit(int8_resnet_apply_fn(model, scales))(
            model.variables, x).astype(jnp.float32)
        fn, qtree = prepare_int8_resnet(model, scales)
        y2 = jax.jit(fn)(qtree, x).astype(jnp.float32)
        # identical math modulo bf16 head rounding
        assert float(jnp.max(jnp.abs(y1 - y2))) <= \
            0.02 * float(jnp.max(jnp.abs(y1)))

    def test_q_residual_mode(self):
        model = ptc.get_model("resnet10", in_size=(64, 64))
        calib = [jax.random.uniform(jax.random.PRNGKey(0), (4, 64, 64, 3))]
        scales = calibrate_int8(model, calib)
        fn, qtree = prepare_int8_resnet(model, scales, q_residual=True)
        x = jax.random.uniform(jax.random.PRNGKey(9), (4, 64, 64, 3))
        y8 = jax.jit(fn)(qtree, x)
        yf = model(x)
        cos, agree = _agreement(y8, yf)
        assert cos > 0.99 and agree == 1.0, (cos, agree)
        # per-stage restriction (measured-and-rejected for the headline —
        # exp_residual_fusion.py — but a supported config): quantized
        # residual carry in stages 1-2 only
        fn12, qtree12 = prepare_int8_resnet(
            model, scales, q_residual={"stage1", "stage2"})
        y12 = jax.jit(fn12)(qtree12, x)
        cos, agree = _agreement(y12, yf)
        assert cos > 0.99 and agree == 1.0, (cos, agree)

    def test_bnless_wrn(self):
        """BN-less cells (ImageNet WRN, reference wrn.py:12 — conv+bias,
        no norm) fold as gain=s_w / bias=conv-bias; SERVE_FULL r5 caught
        the old pipeline crashing on the absent batch_stats collection.
        Measured on v5e: wrn50_2 13.4k int8 vs 6.9k bf16 img/s (1.93x)."""
        model = ptc.get_model("wrn50_2", in_size=(64, 64))
        calib = [jax.random.uniform(jax.random.PRNGKey(0), (4, 64, 64, 3))]
        scales = calibrate_int8(model, calib)
        fn, qtree = prepare_int8_resnet(model, scales)
        x = jax.random.uniform(jax.random.PRNGKey(9), (4, 64, 64, 3))
        y8 = jax.jit(fn)(qtree, x)
        yf = model(x)
        cos, agree = _agreement(y8, yf)
        assert cos > 0.95 and agree == 1.0, (cos, agree)


class TestPreResnetInt8Pipeline:
    @pytest.mark.parametrize("name", ["preresnet18", "preresnet50",
                                      "preresnet50b", "sepreresnet16"])
    def test_parity(self, name):
        from pytorchcv_tpu.quant.preresnet_int8 import \
            prepare_int8_preresnet
        model = ptc.get_model(name, in_size=(64, 64))
        calib = [jax.random.uniform(jax.random.PRNGKey(i), (4, 64, 64, 3))
                 for i in range(2)]
        scales = calibrate_int8(model, calib)
        fn, qtree = prepare_int8_preresnet(model, scales)
        x = jax.random.uniform(jax.random.PRNGKey(9), (4, 64, 64, 3))
        y8 = jax.jit(fn)(qtree, x)
        yf = model(x)
        cos, agree = _agreement(y8, yf)
        assert cos > 0.995 and agree == 1.0, (name, cos, agree)

    def test_serve_dispatch(self):
        from pytorchcv_tpu.serve import (_is_plain_preresnet,
                                         _is_plain_resnet)
        v = ptc.get_model("preresnet18", in_size=(64, 64)).variables
        assert _is_plain_preresnet(v)
        assert not _is_plain_resnet(v)


class TestSpaceToDepthStem:
    def test_exact_vs_direct_conv(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randint(-127, 128, (2, 32, 32, 3)), jnp.int8)
        w = jnp.asarray(rng.randint(-8, 8, (7, 7, 3, 16)), jnp.int8)
        direct = jax.lax.conv_general_dilated(
            x, w, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        xs, ws = _space_to_depth_stem(x, w)
        blocked = jax.lax.conv_general_dilated(
            xs, ws, (1, 1), [(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        np.testing.assert_array_equal(np.asarray(direct),
                                      np.asarray(blocked))


class TestSegBackboneInt8:
    def test_seg_backbone_int8_parity(self):
        """int8-storage dilated resnetd backbone + bf16 head vs the f32
        model (quant/seg_backbone_int8.py): per-pixel argmax agreement."""
        import pytorchcv_tpu as ptc
        from pytorchcv_tpu.quant import calibrate_int8
        from pytorchcv_tpu.quant.seg_backbone_int8 import (
            is_seg_resnetd_backbone, prepare_int8_seg_backbone)

        model = ptc.get_model("pspnet_resnetd50b_voc", in_size=(64, 64),
                              aux=False)
        assert is_seg_resnetd_backbone(model.variables)
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.rand(2, 64, 64, 3) * 2 - 1, jnp.float32)
        scales = calibrate_int8(model, [x])
        fn, qtree = prepare_int8_seg_backbone(model, scales)
        o4, o3 = jax.jit(fn)(qtree, x)
        out = model.module.apply(
            model.variables,
            (o4.astype(jnp.float32), o3.astype(jnp.float32)),
            train=False, from_features=True)
        ref = model(x)
        agree = float((jnp.argmax(out, -1) == jnp.argmax(ref, -1)).mean())
        assert agree > 0.97, agree
        # non-seg trees are rejected
        assert not is_seg_resnetd_backbone(
            ptc.get_model("resnet10", in_size=(64, 64)).variables)

    def test_seg_serving_routes_int8_auto(self):
        """make_serving_fn auto mode routes resnetd-backed seg heads to
        the int8 backbone and yields sane maps."""
        from pytorchcv_tpu.serve import make_serving_fn
        serve = make_serving_fn("deeplabv3_resnetd50b_voc",
                                source_hw=(72, 72), task="segmentation",
                                mode="auto", aux=False, in_size=(64, 64))
        raw = np.random.RandomState(1).randint(0, 256, (2, 72, 72, 3),
                                               np.uint8)
        out = serve(jnp.asarray(raw))
        main = out[0] if isinstance(out, (tuple, list)) else out
        assert main.shape == (2, 64, 64, 21)
        assert bool(jnp.all(jnp.isfinite(main.astype(jnp.float32))))

    def test_pose_backbone_int8_parity(self):
        """int8 plain resnet-b pose trunk + bf16 decoder vs f32 heatmaps
        (basic and bottleneck blocks)."""
        import pytorchcv_tpu as ptc
        from pytorchcv_tpu.quant import calibrate_int8
        from pytorchcv_tpu.quant.seg_backbone_int8 import (
            is_plain_resnet_trunk, prepare_int8_plain_trunk)

        for name in ("simplepose_resnet18_coco", "simplepose_resnet50b_coco"):
            model = ptc.get_model(name, in_size=(64, 48),
                                  return_heatmap=True)
            assert is_plain_resnet_trunk(model.variables), name
            rs = np.random.RandomState(0)
            x = jnp.asarray(rs.rand(2, 64, 48, 3) * 2 - 1, jnp.float32)
            scales = calibrate_int8(model, [x])
            fn, qtree = prepare_int8_plain_trunk(model, scales)
            feat = jax.jit(fn)(qtree, x)
            out = model.module.apply(model.variables,
                                     feat.astype(jnp.float32),
                                     train=False, from_features=True)
            ref = model(x)
            cos = float(jnp.sum(out * ref) /
                        (jnp.linalg.norm(out) * jnp.linalg.norm(ref)))
            assert cos > 0.995, (name, cos)
        # avg-pool-downsample (resneta) trunks are rejected
        assert not is_plain_resnet_trunk(
            ptc.get_model("simplepose_resneta50b_coco",
                          in_size=(64, 48)).variables)

    def test_centernet_trunk_int8_parity(self):
        """int8 plain trunk under the CenterNet decoder heads; auto
        serve routing for task='detection'."""
        import pytorchcv_tpu as ptc
        from pytorchcv_tpu.quant import calibrate_int8
        from pytorchcv_tpu.quant.seg_backbone_int8 import (
            is_plain_resnet_trunk, prepare_int8_plain_trunk)

        model = ptc.get_model("centernet_resnet18_voc", in_size=(128, 128),
                              return_heatmap=True)
        assert is_plain_resnet_trunk(model.variables)
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.rand(2, 128, 128, 3) * 2 - 1, jnp.float32)
        scales = calibrate_int8(model, [x])
        fn, qtree = prepare_int8_plain_trunk(model, scales)
        feat = jax.jit(fn)(qtree, x)
        out = model.module.apply(model.variables, feat.astype(jnp.float32),
                                 train=False, from_features=True)
        ref = model(x)
        cos = float(jnp.sum(out * ref) /
                    (jnp.linalg.norm(out) * jnp.linalg.norm(ref)))
        assert cos > 0.995, cos

        from pytorchcv_tpu.serve import make_serving_fn
        sv = make_serving_fn("centernet_resnet18_voc", source_hw=(140, 140),
                             task="detection", mode="auto",
                             in_size=(128, 128))
        raw = np.random.RandomState(1).randint(0, 256, (2, 140, 140, 3),
                                               np.uint8)
        dets = sv(jnp.asarray(raw))
        assert np.asarray(dets).shape == (2, 40, 6)

    def test_alphapose_se_trunk_int8_parity(self):
        """SE units inside the plain int8 trunk (alphapose's
        fastseresnet101b): gate on the bf16 pre-add tensor."""
        import pytorchcv_tpu as ptc
        from pytorchcv_tpu.quant import calibrate_int8
        from pytorchcv_tpu.quant.seg_backbone_int8 import (
            is_plain_resnet_trunk, prepare_int8_plain_trunk)

        model = ptc.get_model("alphapose_fastseresnet101b_coco",
                              in_size=(64, 48), return_heatmap=True)
        assert is_plain_resnet_trunk(model.variables)
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.rand(2, 64, 48, 3) * 2 - 1, jnp.float32)
        scales = calibrate_int8(model, [x])
        fn, qtree = prepare_int8_plain_trunk(model, scales)
        feat = jax.jit(fn)(qtree, x)
        out = model.module.apply(model.variables, feat.astype(jnp.float32),
                                 train=False, from_features=True)
        ref = model(x)
        cos = float(jnp.sum(out * ref) /
                    (jnp.linalg.norm(out) * jnp.linalg.norm(ref)))
        # 101 random-init layers accumulate more quant noise than the
        # 18/50-layer cases (>0.995); trained weights behave better.
        assert cos > 0.99, cos


class TestPretrainedLikeRobustness:
    def test_outlier_channel_weights(self):
        """PTQ robustness on a pretrained-like weight distribution
        (VERDICT r3 item 8): random-init weights are i.i.d. and easy;
        pretrained nets carry 10-50x outlier conv channels whose scale
        the following BN absorbs (post-BN-fold per-channel gains then
        span orders of magnitude — the known PTQ hard case). Synthesize
        that on resnet18: boost ~6% of each conv's output channels by
        U[10, 50] and compensate mean/var in its BN so the f32 network
        still computes sane activations; per-channel weight scales must
        hold >=0.99 cosine / >=0.95 decisive-argmax agreement."""
        import jax.tree_util as jtu

        model = ptc.get_model("resnet18", in_size=(64, 64))
        rs = np.random.RandomState(0)

        params = jax.tree_util.tree_map(np.asarray,
                                        model.variables["params"])
        stats = jax.tree_util.tree_map(np.asarray,
                                       model.variables["batch_stats"])

        def boost(pcell, scell):
            k = pcell["conv"]["kernel"]
            n_out = k.shape[-1]
            f = np.ones((n_out,), np.float32)
            idx = rs.choice(n_out, max(1, n_out // 16), replace=False)
            f[idx] = rs.uniform(10.0, 50.0, len(idx)).astype(np.float32)
            pcell["conv"]["kernel"] = k * f
            scell["mean"] = scell["mean"] * f
            scell["var"] = scell["var"] * f * f

        def walk(p, s):
            if isinstance(p, dict):
                if "conv" in p and "bn" in p and \
                        isinstance(p["conv"], dict) and \
                        "kernel" in p["conv"] and "mean" in s.get("bn", {}):
                    boost(p, s["bn"])
                for key in p:
                    if key in s:
                        walk(p[key], s[key])

        walk(params, stats)
        n_boosted = 0
        flat_p = jtu.tree_leaves_with_path(params)
        orig_p = jtu.tree_leaves_with_path(model.variables["params"])
        for (pa, a), (pb, b) in zip(flat_p, orig_p):
            if np.asarray(a).shape == np.asarray(b).shape and \
                    not np.allclose(np.asarray(a), np.asarray(b)):
                n_boosted += 1
        assert n_boosted >= 15, n_boosted   # the fixture really bit

        import dataclasses
        model = dataclasses.replace(
            model, variables={"params": jtu.tree_map(jnp.asarray, params),
                              "batch_stats": jtu.tree_map(jnp.asarray,
                                                          stats)})

        calib = [jax.random.uniform(jax.random.PRNGKey(i), (4, 64, 64, 3))
                 for i in range(2)]
        scales = calibrate_int8(model, calib)
        fn, qtree = prepare_int8_resnet(model, scales)
        x = jax.random.uniform(jax.random.PRNGKey(9), (8, 64, 64, 3))
        y8 = jax.jit(fn)(qtree, x)
        yf = model(x)
        cos, agree = _agreement(y8, yf)
        assert cos > 0.99 and agree >= 0.95, (cos, agree)
