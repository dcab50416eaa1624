"""Semantic-segmentation PixAcc / mIoU evaluation harness.

    python tools/eval_seg.py pspnet_resnetd50b_voc val_images.npy \
        val_masks.npy [--mode auto|int8|bf16]

Implements the reference's published seg eval protocol
(reference README.md:734-757 rows: PixAcc / mIoU on VOC 480x480,
Cityscapes 1024x2048, ADE20K, COCO): frames resize directly to the
head's fixed input size (segmentation_preprocess), class logits are
bilinearly upsampled back to the label resolution, and the standard
confusion-matrix metrics accumulate with the ignore label excluded:

    PixAcc = sum_c TP_c / #labeled
    mIoU   = mean over classes with nonzero union of TP/(TP+FP+FN)

Inputs are raw uint8 frames as an (N, H, W, 3) array and int masks as
(N, H, W) with 255 (or any value >= num_classes) = ignore (decoded
offline; this environment has no dataset or JPEG tooling).
``--selftest`` proves the harness runnable on synthetic data.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def confusion_update(conf: np.ndarray, pred: np.ndarray, gt: np.ndarray):
    """Accumulate an (C, C) confusion matrix; gt values outside [0, C)
    (e.g. the 255 ignore label) are excluded."""
    c = conf.shape[0]
    valid = (gt >= 0) & (gt < c)
    idx = gt[valid].astype(np.int64) * c + pred[valid].astype(np.int64)
    conf += np.bincount(idx, minlength=c * c).reshape(c, c)
    return conf


def metrics_from_confusion(conf: np.ndarray):
    tp = np.diag(conf).astype(np.float64)
    total = conf.sum()
    union = conf.sum(0) + conf.sum(1) - np.diag(conf)
    present = union > 0
    iou = tp[present] / union[present]
    return {"pix_acc": float(tp.sum() / max(total, 1)),
            "miou": float(iou.mean()) if present.any() else 0.0,
            "n_classes_present": int(present.sum())}


def evaluate(model_name: str, images: np.ndarray, masks: np.ndarray,
             num_classes: int, batch: int = 8, mode: str = "auto",
             pretrained: bool = True, serve=None, **model_kwargs):
    import jax
    import jax.numpy as jnp
    from pytorchcv_tpu.serve import make_serving_fn

    if serve is None:
        serve = make_serving_fn(model_name, source_hw=images.shape[1:3],
                                task="segmentation", mode=mode,
                                pretrained=pretrained, **model_kwargs)
    h, w = masks.shape[1:3]

    @jax.jit
    def predict(raw):
        out = serve(raw)
        logits = out[0] if isinstance(out, (tuple, list)) else out
        up = jax.image.resize(logits.astype(jnp.float32),
                              (logits.shape[0], h, w, logits.shape[-1]),
                              "bilinear")
        return jnp.argmax(up, axis=-1).astype(jnp.int32)

    conf = np.zeros((num_classes, num_classes), np.int64)
    n = (len(images) // batch) * batch
    for i in range(0, n, batch):
        pred = np.asarray(predict(jnp.asarray(images[i:i + batch])))
        confusion_update(conf, pred, masks[i:i + batch])
    res = metrics_from_confusion(conf)
    res["n"] = n
    return res


def _selftest():
    """Synthetic smoke: masks taken from the model's own predictions must
    score PixAcc = mIoU = 1.0 (ignore pixels excluded); a deliberately
    shifted mask must score < 1."""
    import jax.numpy as jnp
    from pytorchcv_tpu.serve import make_serving_fn

    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (4, 96, 96, 3), np.uint8)
    serve = make_serving_fn("fastscnn_cityscapes", source_hw=(96, 96),
                            task="segmentation", mode="bf16",
                            pretrained=False)
    out = serve(jnp.asarray(images))
    logits = out[0] if isinstance(out, (tuple, list)) else out
    import jax
    up = jax.image.resize(logits.astype(jnp.float32),
                          (4, 96, 96, logits.shape[-1]), "bilinear")
    masks = np.asarray(jnp.argmax(up, -1), np.int32)
    masks_ign = masks.copy()
    masks_ign[:, :8] = 255        # ignore band must not affect the score

    res = evaluate("fastscnn_cityscapes", images, masks_ign, 19, batch=2,
                   mode="bf16", pretrained=False, serve=serve)
    print("selftest:", res)
    # jit-vs-eager fusion can flip near-tie argmax pixels: ~0.02% here
    assert res["pix_acc"] > 0.999 and res["miou"] > 0.99, res

    bad = evaluate("fastscnn_cityscapes", images, np.roll(masks_ign, 7, 2),
                   19, batch=2, mode="bf16", pretrained=False, serve=serve)
    print("selftest shifted:", bad)
    # random-init maps are one-class-dominated, so pix_acc stays high on a
    # shift; mIoU is the shift-sensitive metric (0.99 -> ~0.28 here)
    assert bad["pix_acc"] < res["pix_acc"] and bad["miou"] < 0.5, bad

    # metric unit check on a hand confusion matrix
    conf = np.array([[3, 1], [0, 4]], np.int64)
    m = metrics_from_confusion(conf)
    assert abs(m["pix_acc"] - 7 / 8) < 1e-12
    assert abs(m["miou"] - (3 / 4 + 4 / 5) / 2) < 1e-12
    print("OK")


if __name__ == "__main__":
    if "--selftest" in sys.argv or len(sys.argv) < 4:
        _selftest()
    else:
        imgs = np.load(sys.argv[2], mmap_mode="r")
        msks = np.load(sys.argv[3], mmap_mode="r")
        mode = sys.argv[sys.argv.index("--mode") + 1] \
            if "--mode" in sys.argv else "auto"
        import pytorchcv_tpu as ptc
        nc = ptc.get_model(sys.argv[1], init=False).num_classes
        print(evaluate(sys.argv[1], imgs, msks, nc, mode=mode))
