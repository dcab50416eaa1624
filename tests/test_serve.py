"""End-to-end serving pipeline (serve.make_serving_fn)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from pytorchcv_tpu.serve import make_serving_fn, _is_plain_resnet
import pytorchcv_tpu as ptc


def test_resnet_int8_serving():
    serve = make_serving_fn("resnet10", source_hw=(74, 74))
    raw = np.random.RandomState(0).randint(0, 256, (4, 74, 74, 3), np.uint8)
    logits = serve(jnp.asarray(raw))
    assert logits.shape == (4, 1000)
    assert bool(jnp.all(jnp.isfinite(logits.astype(jnp.float32))))


def test_bf16_fallback_for_non_resnet():
    serve = make_serving_fn("mobilenet_wd4", source_hw=(74, 74),
                            mode="bf16")
    raw = np.random.RandomState(1).randint(0, 256, (2, 74, 74, 3), np.uint8)
    logits = serve(jnp.asarray(raw))
    assert logits.shape == (2, 1000)


def test_sharded_serving():
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    serve = make_serving_fn("resnet10", source_hw=(74, 74), mesh=mesh)
    raw = np.random.RandomState(2).randint(0, 256, (16, 74, 74, 3),
                                           np.uint8)
    logits = serve(jnp.asarray(raw))
    assert logits.shape == (16, 1000)


def test_default_calibration_runs_in_preprocessed_domain():
    """Default calibration must see ImageNet-normalized inputs (amax ~2+),
    not raw [0,1) pixels — a domain mismatch saturates every layer."""
    from pytorchcv_tpu.serve import _calibrate
    from pytorchcv_tpu.kernels.preprocess import classification_preprocess
    model = ptc.get_model("resnet10", in_size=(64, 64))
    pre = classification_preprocess(64, (74, 74), out_dtype=jnp.float32)
    scales = _calibrate(model, None, pre, (74, 74))
    stem = scales["features/init_block/conv/conv"]
    assert stem > 1.5, stem


def test_generic_int8_mode_for_non_resnet():
    serve = make_serving_fn("mobilenet_wd4", source_hw=(74, 74),
                            mode="int8")
    raw = np.random.RandomState(3).randint(0, 256, (2, 74, 74, 3),
                                           np.uint8)
    logits = serve(jnp.asarray(raw))
    assert logits.shape == (2, 1000)
    assert bool(jnp.all(jnp.isfinite(logits.astype(jnp.float32))))


def test_preresnet_serving_end_to_end():
    serve = make_serving_fn("preresnet10", source_hw=(74, 74))
    raw = np.random.RandomState(5).randint(0, 256, (2, 74, 74, 3),
                                           np.uint8)
    logits = serve(jnp.asarray(raw))
    assert logits.shape == (2, 1000)
    assert bool(jnp.all(jnp.isfinite(logits.astype(jnp.float32))))


def test_vgg_serving_end_to_end():
    """serve auto mode routes VGG trees to the int8-storage pipeline
    (measured 8.3k img/s int8 vs 5.1k bf16, vgg16 batch 256 on v5e)."""
    serve = make_serving_fn("vgg11", source_hw=(74, 74))
    raw = np.random.RandomState(6).randint(0, 256, (2, 74, 74, 3),
                                           np.uint8)
    logits = serve(jnp.asarray(raw))
    assert logits.shape == (2, 1000)
    assert bool(jnp.all(jnp.isfinite(logits.astype(jnp.float32))))


def test_eval_protocol_dispatch():
    """Dataset->protocol table (VERDICT r4 item 1): ImageNet rows keep
    resize+crop; CIFAR/SVHN rows (null metainfo in_size) are direct-fed at
    the ctor size with CIFAR normalization; null in_size NEVER defaults
    to 224."""
    import pytest
    from pytorchcv_tpu.kernels.preprocess import (CIFAR_MEAN, IMAGENET_MEAN,
                                                  eval_protocol)

    mode, crop, scale, mean, _ = eval_protocol("resnet50")
    assert (mode, crop, scale) == ("resize_crop", (224, 224), 0.875)
    assert mean == IMAGENET_MEAN

    mode, crop, scale, mean, _ = eval_protocol("resnet20_cifar10",
                                               model_in_size=(32, 32))
    assert (mode, crop) == ("direct", (32, 32))
    assert mean == CIFAR_MEAN

    # CUB rows: null in_size, ImageNet-style protocol at the ctor size
    mode, crop, _, mean, _ = eval_protocol("resnet10_cub",
                                           model_in_size=(224, 224))
    assert (mode, crop) == ("resize_crop", (224, 224))
    assert mean == IMAGENET_MEAN

    # null in_size with no ctor fallback must be an error, not 224
    with pytest.raises(ValueError):
        eval_protocol("resnet20_cifar10")


def test_cifar_serving_direct_feed():
    """A 32x32-trained CIFAR net must be served the 32x32 direct-feed
    protocol: 32x32 source passes through bit-identically (identity
    interpolation matrices) and the pipeline agrees with the f32 direct
    forward (the assertion that catches the 224-crop bug)."""
    serve = make_serving_fn("resnet20_cifar10", source_hw=(32, 32))
    raw = np.random.RandomState(4).randint(0, 256, (2, 32, 32, 3), np.uint8)
    logits = serve(jnp.asarray(raw))
    assert logits.shape == (2, 10)
    ref = serve.make_reference_forward()(jnp.asarray(raw))
    a = np.asarray(logits, np.float32).ravel()
    b = np.asarray(ref, np.float32).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos > 0.95, cos


def test_plain_resnet_detector():
    assert _is_plain_resnet(
        ptc.get_model("resnet10", in_size=(64, 64)).variables)
    assert not _is_plain_resnet(
        ptc.get_model("mobilenet_wd4", in_size=(64, 64)).variables)


def test_segmentation_serving_end_to_end():
    """uint8 frames -> per-pixel class maps under the seg protocol
    (direct resize to the head's fixed size, reference README.md:157)."""
    serve = make_serving_fn("fastscnn_cityscapes", source_hw=(100, 180),
                            task="segmentation", mode="bf16")
    raw = np.random.RandomState(0).randint(0, 256, (2, 100, 180, 3),
                                           np.uint8)
    out = serve(jnp.asarray(raw))
    main = out[0] if isinstance(out, (tuple, list)) else out
    assert main.shape[0] == 2 and main.shape[-1] == 19
    assert bool(jnp.all(jnp.isfinite(main.astype(jnp.float32))))


def test_spatial_sharded_segmentation_serving():
    """shard='spatial' splits the image H axis over the mesh (the
    latency path for huge seg inputs); outputs must match unsharded —
    XLA inserts the conv halo exchanges."""
    serve1 = make_serving_fn("fastscnn_cityscapes", source_hw=(104, 180),
                             task="segmentation", mode="bf16")
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    serve8 = make_serving_fn("fastscnn_cityscapes", source_hw=(104, 180),
                             task="segmentation", mode="bf16",
                             mesh=mesh, shard="spatial")
    raw = np.random.RandomState(3).randint(0, 256, (1, 104, 180, 3),
                                           np.uint8)
    y1 = serve1(jnp.asarray(raw))
    y8 = serve8(jnp.asarray(raw))
    m1 = y1[0] if isinstance(y1, (tuple, list)) else y1
    m8 = y8[0] if isinstance(y8, (tuple, list)) else y8
    np.testing.assert_allclose(np.asarray(m8, np.float32),
                               np.asarray(m1, np.float32),
                               rtol=0.02, atol=0.05)


def test_pose_serving_end_to_end():
    """COCO pose protocol: 256x192 person crops -> decoded keypoints."""
    serve = make_serving_fn("simplepose_mobile_mobilenetv3_small_w1_coco",
                            source_hw=(300, 200), task="pose", mode="bf16")
    raw = np.random.RandomState(1).randint(0, 256, (2, 300, 200, 3),
                                           np.uint8)
    out = serve(jnp.asarray(raw))
    leaves = jax.tree_util.tree_leaves(out)
    assert leaves and all(l.shape[0] == 2 for l in leaves)


def test_detection_serving_end_to_end():
    """CenterNet protocol: direct resize to 512x512 -> (B, topk, 6)."""
    serve = make_serving_fn("centernet_resnet18_voc", source_hw=(280, 400),
                            task="detection", mode="bf16")
    raw = np.random.RandomState(2).randint(0, 256, (1, 280, 400, 3),
                                           np.uint8)
    out = serve(jnp.asarray(raw))
    assert out.shape[0] == 1 and out.shape[-1] == 6


def test_mobilenet_auto_int8_serving():
    """auto mode routes MobileNetV2 trees to the int8-storage pipeline."""
    serve = make_serving_fn("mobilenetv2_wd2", source_hw=(74, 74))
    raw = np.random.RandomState(7).randint(0, 256, (2, 74, 74, 3),
                                           np.uint8)
    logits = serve(jnp.asarray(raw))
    assert logits.shape == (2, 1000)
    assert bool(jnp.all(jnp.isfinite(logits.astype(jnp.float32))))


def test_mobilenet_v1_auto_int8_serving():
    """auto mode routes MobileNet v1 trees to the int8-storage pipeline
    (measured 53.5k img/s int8 vs 41.7k bf16 for mobilenet_w1 on v5e)."""
    serve = make_serving_fn("mobilenet_wd4", source_hw=(74, 74))
    raw = np.random.RandomState(9).randint(0, 256, (2, 74, 74, 3),
                                           np.uint8)
    logits = serve(jnp.asarray(raw))
    assert logits.shape == (2, 1000)
    assert bool(jnp.all(jnp.isfinite(logits.astype(jnp.float32))))


def test_dense_se_int8_pipeline():
    """SE in the dense (fc1/fc2) parameterization — fastseresnet-style —
    must take the int8 path and match the bf16 reference closely (ADVICE
    r1: _se_gate previously crashed with KeyError 'conv1')."""
    from pytorchcv_tpu.model import Model
    from pytorchcv_tpu.models.fastseresnet import FastSEResNet
    from pytorchcv_tpu.quant import calibrate_int8
    from pytorchcv_tpu.quant.resnet_int8 import prepare_int8_resnet

    module = FastSEResNet(channels=[[32, 32], [64, 64]],
                          init_block_channels=16, bottleneck=True,
                          conv1_stride=False, in_size=(64, 64),
                          num_classes=10)
    model = Model("tiny_fastse", module).init()
    assert _is_plain_resnet(model.variables)

    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3) * 4 - 2,
                    jnp.float32)
    scales = calibrate_int8(model, [x])
    fn, qtree = prepare_int8_resnet(model, scales)
    got = np.asarray(fn(qtree, x), np.float32)
    ref = np.asarray(model.module.apply(model.variables, x, train=False),
                     np.float32)
    assert np.all(np.isfinite(got))
    cos = float((got * ref).sum() /
                (np.linalg.norm(got) * np.linalg.norm(ref) + 1e-9))
    assert cos > 0.98, cos


def test_asr_serving_end_to_end():
    """make_asr_serving_fn: auto routes dense-conv Jasper through the
    int8-storage pipeline; QuartzNet stays bf16; int8 on QuartzNet
    raises. Mel-feature input path (from_audio=False keeps the test off
    the heavy front-end)."""
    from pytorchcv_tpu.serve import make_asr_serving_fn
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 128, 64) * 2, jnp.float32)
    x_len = jnp.array([128, 107], jnp.int32)

    serve = make_asr_serving_fn("jasper5x3", from_audio=False)
    logits, lens = serve(x, x_len)
    assert logits.shape == (2, 64, 29)
    assert np.array_equal(np.asarray(lens), [64, 54])
    assert bool(jnp.all(jnp.isfinite(logits.astype(jnp.float32))))

    qn = make_asr_serving_fn("quartznet5x5_en_ls", from_audio=False)
    ql, qlens = qn(x, x_len)
    assert ql.shape == (2, 64, 29)
    assert np.array_equal(np.asarray(qlens), [64, 54])

    import pytest
    with pytest.raises(ValueError):
        make_asr_serving_fn("quartznet5x5_en_ls", mode="int8",
                            from_audio=False)


def test_audio_reader_and_from_files_serving(tmp_path):
    """AudioReader (reference NemoAudioReader analog, jasper.py:125-190):
    stdlib-wave PCM16 read, stereo downmix, 8k->16k resample; and the
    from_files serving stage feeding the jitted waveform path."""
    import wave

    from pytorchcv_tpu.models.jasper import AudioReader, batch_waveforms
    from pytorchcv_tpu.serve import make_asr_serving_fn

    sr = 8000
    t = np.arange(sr, dtype=np.float64) / sr          # 1 s
    tone = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    stereo = np.stack([tone, tone], 1)
    pcm = (stereo * 32767).astype("<i2")
    path = tmp_path / "tone.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())

    reader = AudioReader(16000)
    data = reader.read_from_file(str(path))
    assert data.dtype == np.float32 and data.ndim == 1
    assert len(data) == 16000                          # resampled to 1 s
    # mono downmix of identical channels + linear resample stays a tone
    ref = 0.5 * np.sin(2 * np.pi * 440.0 *
                       np.arange(16000, dtype=np.float64) / 16000)
    # (last sample clamps — np.interp edge behavior)
    assert np.abs(data - ref)[:-1].max() < 0.02

    # second, shorter file exercises padding
    path2 = tmp_path / "half.wav"
    with wave.open(str(path2), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm[:sr // 2, 0].tobytes())
    waves = reader.read_from_files([str(path), str(path2)])
    x, x_len = batch_waveforms(waves)
    assert x.shape[0] == 2 and x.shape[1] % 1600 == 0
    assert list(x_len) == [16000, 8000]

    serve = make_asr_serving_fn("jasper5x3", from_files=True)
    logits, lens = serve([str(path), str(path2)])
    assert logits.shape[0] == 2 and logits.shape[2] == 29
    assert int(lens[0]) > int(lens[1])
    assert bool(jnp.all(jnp.isfinite(logits.astype(jnp.float32))))
