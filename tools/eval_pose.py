"""Top-down pose-estimation OKS AP evaluation harness.

    python tools/eval_pose.py simplepose_resnet50b_coco crops.npy \
        gt_keypoints.npy areas.npy [--mode auto|int8|bf16]

Implements the COCO keypoint protocol the reference's pose rows publish
(reference README.md:780-782, "OKS AP" on COCO val person crops): each
(H, W, 3) uint8 person crop runs through the pose serving path
(direct resize to the model's 256x192 input), the decoded heatmap
keypoints (HeatmapMaxDetBlock, (K, 3) = x, y, score in heatmap pixels)
are mapped back to crop pixels, and per-sample Object Keypoint
Similarity is scored against ground truth:

    OKS = sum_i exp(-d_i^2 / (2 s^2 k_i^2)) [v_i > 0] / sum_i [v_i > 0]

with the 17 COCO per-keypoint constants k_i and s^2 = object area. The
reported AP is the matched, single-candidate-per-crop simplification
(one detection per ground-truth person — the top-down evaluation
setting): mean over OKS thresholds 0.50:0.05:0.95 of the recall at that
threshold. ``--selftest`` proves the harness runnable end to end.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# COCO per-keypoint sigmas (cocodataset/cocoapi pycocotools/cocoeval.py)
COCO_SIGMAS = np.array([
    0.026, 0.025, 0.025, 0.035, 0.035, 0.079, 0.079, 0.072, 0.072,
    0.062, 0.062, 0.107, 0.107, 0.087, 0.087, 0.089, 0.089], np.float64)

OKS_THRESHOLDS = np.arange(0.50, 1.0, 0.05)


def oks(pred_xy: np.ndarray, gt: np.ndarray, area: float,
        sigmas: np.ndarray = None) -> float:
    """Object Keypoint Similarity for one person.

    pred_xy: (K, 2) predicted pixel coords; gt: (K, 3) = (x, y, v);
    area: ground-truth object area in pixels^2.
    """
    k = gt.shape[0]
    if sigmas is None:
        sigmas = COCO_SIGMAS if k == 17 else np.full((k,), 0.079)
    vis = gt[:, 2] > 0
    if not vis.any():
        return 0.0
    d2 = ((pred_xy[:, 0] - gt[:, 0]) ** 2 +
          (pred_xy[:, 1] - gt[:, 1]) ** 2)
    var = (2 * sigmas) ** 2
    e = d2 / (var * max(area, 1.0) * 2)
    return float(np.exp(-e)[vis].mean())


def ap_from_oks(oks_values: np.ndarray) -> dict:
    res = {f"AP{int(t * 100)}": float((oks_values > t).mean())
           for t in (0.5, 0.75)}
    res["AP"] = float(np.mean([(oks_values > t).mean()
                               for t in OKS_THRESHOLDS]))
    return res


def evaluate(model_name: str, crops: np.ndarray, gt_keypoints: np.ndarray,
             areas: np.ndarray, batch: int = 16, mode: str = "auto",
             heatmap_stride: int = 4, pretrained: bool = True,
             serve=None, **model_kwargs):
    """crops: (N, H, W, 3) uint8 person crops; gt_keypoints: (N, K, 3)
    (x, y, visibility) in crop pixels; areas: (N,) object areas."""
    import jax.numpy as jnp
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.serve import make_serving_fn

    if serve is None:
        serve = make_serving_fn(model_name, source_hw=crops.shape[1:3],
                                task="pose", mode=mode,
                                pretrained=pretrained, **model_kwargs)
    in_h, in_w = ptc.get_model(model_name, init=False,
                               **model_kwargs).in_size
    hm_h, hm_w = in_h // heatmap_stride, in_w // heatmap_stride
    src_h, src_w = crops.shape[1:3]
    scale = np.array([src_w / hm_w, src_h / hm_h], np.float64)

    n = (len(crops) // batch) * batch
    vals = []
    for i in range(0, n, batch):
        kp = np.asarray(serve(jnp.asarray(crops[i:i + batch])),
                        np.float64)               # (B, K, 3) heatmap px
        pred_xy = kp[:, :, :2] * scale            # -> crop pixels
        for b in range(kp.shape[0]):
            vals.append(oks(pred_xy[b], gt_keypoints[i + b],
                            float(areas[i + b])))
    res = ap_from_oks(np.asarray(vals))
    res.update(n=n, mean_oks=float(np.mean(vals)))
    return res


def _selftest():
    """Ground truth synthesized from the model's own decoded keypoints
    must score OKS = AP = 1.0; displaced ground truth must score lower,
    and the OKS formula reproduces a hand-computed value."""
    import jax.numpy as jnp
    from pytorchcv_tpu.serve import make_serving_fn

    name = "simplepose_mobile_mobilenetv3_small_w1_coco"
    rng = np.random.RandomState(0)
    crops = rng.randint(0, 256, (4, 256, 192, 3), np.uint8)
    serve = make_serving_fn(name, source_hw=(256, 192), task="pose",
                            mode="bf16", pretrained=False)
    kp = np.asarray(serve(jnp.asarray(crops)), np.float64)  # heatmap px
    gt = np.concatenate([kp[:, :, :2] * 4.0,
                         np.ones((4, kp.shape[1], 1))], 2)
    areas = np.full((4,), 256 * 192, np.float64)

    res = evaluate(name, crops, gt, areas, batch=2, mode="bf16",
                   pretrained=False, serve=serve)
    print("selftest:", res)
    assert res["AP"] == 1.0 and res["mean_oks"] > 0.999, res

    far = gt.copy()
    far[:, :, :2] += 80.0
    bad = evaluate(name, crops, far, areas, batch=2, mode="bf16",
                   pretrained=False, serve=serve)
    print("selftest displaced:", bad)
    assert bad["AP"] < 1.0 and bad["mean_oks"] < res["mean_oks"], bad

    # OKS unit check: single visible keypoint at distance d, uniform sigma
    gt1 = np.array([[10.0, 10.0, 2.0]])
    pred1 = np.array([[13.0, 14.0]])          # d^2 = 25
    area = 100.0
    want = np.exp(-25.0 / ((2 * 0.079) ** 2 * area * 2))
    got = oks(pred1, gt1, area)
    assert abs(got - want) < 1e-12, (got, want)
    print("OK")


if __name__ == "__main__":
    if "--selftest" in sys.argv or len(sys.argv) < 5:
        _selftest()
    else:
        crops = np.load(sys.argv[2], mmap_mode="r")
        gt = np.load(sys.argv[3])
        areas = np.load(sys.argv[4])
        mode = sys.argv[sys.argv.index("--mode") + 1] \
            if "--mode" in sys.argv else "auto"
        print(evaluate(sys.argv[1], crops, gt, areas, mode=mode))
