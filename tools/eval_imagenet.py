"""ImageNet-1K top-1/top-5 evaluation harness (reference protocol).

    python tools/eval_imagenet.py resnet50 /path/to/val_images.npy \
        /path/to/val_labels.npy [--int8]

Implements the reference eval protocol (reference README.md:157-167):
PIL-bilinear resize short side to round(size/0.875), center-crop,
normalize — via the fused preprocess pipeline — then batched jitted
inference and top-1/top-5 error accumulation. Expects raw uint8 images
as an (N, H, W, 3) array (decoded offline; this environment has no
dataset or JPEG tooling). ``--selftest`` runs on synthetic data.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def evaluate(model_name: str, images: np.ndarray, labels: np.ndarray,
             batch: int = 100, int8: bool = False, pretrained: bool = True):
    import jax
    import jax.numpy as jnp
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.kernels.preprocess import classification_preprocess

    model = ptc.get_model(model_name, pretrained=pretrained)
    pre = classification_preprocess(model_name, images.shape[1:3])
    if int8:
        from pytorchcv_tpu.quant import calibrate_int8
        from pytorchcv_tpu.quant.resnet_int8 import prepare_int8_resnet
        calib = [pre(jnp.asarray(images[:8])).astype(jnp.float32)]
        scales = calibrate_int8(model, calib)
        fn, qtree = prepare_int8_resnet(model, scales)
        infer = jax.jit(lambda x: fn(qtree, x))
    else:
        bf = model.as_bfloat16()
        infer = jax.jit(
            lambda x: bf.module.apply(bf.variables, x, train=False))

    n = (len(images) // batch) * batch
    top1 = top5 = 0
    for i in range(0, n, batch):
        x = pre(jnp.asarray(images[i:i + batch]))
        logits = np.asarray(infer(x), np.float32)
        y = labels[i:i + batch]
        rank = np.argsort(-logits, axis=1)
        top1 += int((rank[:, 0] == y).sum())
        top5 += int((rank[:, :5] == y[:, None]).any(1).sum())
    return {"n": n, "top1_err": 1 - top1 / n, "top5_err": 1 - top5 / n}


def _selftest():
    """Synthetic smoke: random images, labels from the f32 model's own
    argmax — eval must then report ~0 top-1 error for the same precision
    and near-0 for int8 (quantization agreement)."""
    import jax.numpy as jnp
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.kernels.preprocess import classification_preprocess

    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (64, 256, 256, 3), np.uint8)
    model = ptc.get_model("resnet10")
    pre = classification_preprocess(224, (256, 256))
    labels = np.asarray(
        jnp.argmax(model(pre(jnp.asarray(images)).astype(jnp.float32)), 1))

    import pytorchcv_tpu as ptc_pkg
    orig = ptc_pkg.get_model
    ptc_pkg.get_model = lambda name, pretrained=False, **kw: \
        orig(name, pretrained=False, **kw) if name != "resnet10" else model
    try:
        res = evaluate("resnet10", images, labels, batch=32,
                       pretrained=False)
    finally:
        ptc_pkg.get_model = orig
    print("selftest:", res)
    assert res["top1_err"] < 0.05, res
    print("OK")


if __name__ == "__main__":
    if "--selftest" in sys.argv or len(sys.argv) < 3:
        _selftest()
    else:
        imgs = np.load(sys.argv[2], mmap_mode="r")
        lbls = np.load(sys.argv[3])
        res = evaluate(sys.argv[1], imgs, lbls,
                       int8="--int8" in sys.argv)
        print(res)
