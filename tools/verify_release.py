"""Release verification orchestrator: weights -> convert -> eval -> gate.

One command that, for any released model, drives the COMPLETE pretrained
verification loop the reference implies but never ships (its accuracy
numbers come from the external imgclsmob repo, reference README.md:13-14):

    download (reference model_store.py:140-192 protocol, SHA1-verified)
      -> torch zip-pickle read -> OIHW->HWIO conversion (zoo/convert.py)
      -> task-matched accuracy eval (tools/eval_imagenet|seg|pose|asr.py)
      -> compare against the published metric encoded in the registry
         (the ``error`` field of metainfo.json = reference
         model_metainfos.csv col 3 / README tables README.md:153-818).

Usage:
    python tools/verify_release.py resnet50 --data /path/to/data
    python tools/verify_release.py --dataset in1k --data /path/to/data
    python tools/verify_release.py --selftest

This environment has zero network egress and no datasets, so real runs
wait for deployment; ``--selftest`` proves the loop end-to-end offline by
serving the committed release-layout fixture
(tests/fixtures/resnet20_cifar10-*.pth.zip) through the real
download/sha1/convert path and evaluating on synthetic data (including a
deliberate-mismatch case that must FAIL the gate).

Expected data layout (arrays decoded offline; no JPEG tooling here):
    {data}/in1k/val_images.npy (N,H,W,3) u8 + val_labels.npy (N,)
    {data}/cub/val_images.npy + val_labels.npy
    {data}/cifar10|cifar100|svhn/test_images.npy (N,32,32,3) + test_labels.npy
    {data}/voc|ade20k|cs|cocoseg/images.npy + masks.npy (N,h,w) int
    {data}/cocohpe/crops.npy + keypoints.npy (N,17,3) + areas.npy
    {data}/mcv/waveforms.npy (N,T) f32 + lengths.npy + transcripts.json
"""

import argparse
import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

TOOLS = os.path.dirname(os.path.abspath(__file__))

# Published-metric semantics of the registry ``error`` field per dataset
# (reference weight filenames encode exactly one headline metric; which
# one follows the README table for that task):
#   in1k  -> top-5 error  (resnet50-0633 <=> README.md:200 "6.33")
#   cub/cf-> top-1 error
#   seg   -> mIoU, higher-better (pspnet_..._voc-8024 <=> README.md:734)
#   cocohpe -> OKS AP, higher-better (README.md:780-782)
#   mcv   -> WER (README.md:806-809)
METRIC = {
    "in1k": ("top5_err", False),
    "cub": ("top1_err", False),
    "cf": ("top1_err", False),
    "voc": ("miou", True),
    "ade20k": ("miou", True),
    "cs": ("miou", True),
    "cocoseg": ("miou", True),
    "cocohpe": ("oks_ap", True),
    "mcv": ("wer", False),
}

# Per-sub-dataset normalize stats for the 32x32 clones (the reference's
# external eval used dataset statistics, not ImageNet's).
CF_STATS = {
    "cifar": ((0.4914, 0.4822, 0.4465), (0.2023, 0.1994, 0.2010)),
    "svhn": ((0.4377, 0.4438, 0.4728), (0.1980, 0.2010, 0.1970)),
}

SEG_CLASSES = {"voc": 21, "ade20k": 150, "cs": 19, "cocoseg": 21}


def _load_tool(stem):
    spec = importlib.util.spec_from_file_location(
        stem, os.path.join(TOOLS, stem + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def published_metric(row):
    """(kind, value_fraction, higher_is_better) from a metainfo row."""
    ds = row.get("dataset")
    err = row.get("error")
    if ds not in METRIC or not err or err in ("NA", "0000"):
        return None
    kind, higher = METRIC[ds]
    return kind, int(err) / 1e4, higher


def _gate(measured, published, higher_is_better, tol):
    """Within tolerance, or strictly better than published, passes."""
    delta = measured - published
    return abs(delta) <= tol or (delta > 0 if higher_is_better
                                 else delta < 0)


def _cf_sub(name):
    for sub in ("cifar100", "cifar10", "svhn"):
        if name.endswith(sub):
            return sub
    return None


def _eval_classification_32(model_name, images, labels, stats, batch=200,
                            pretrained=True, model=None):
    """32x32-clone protocol: no resize/crop, dataset normalize stats."""
    import jax
    import jax.numpy as jnp
    import pytorchcv_tpu as ptc

    if model is None:
        model = ptc.get_model(model_name, pretrained=pretrained)
    mean, std = stats
    a = jnp.asarray([1.0 / (255.0 * s) for s in std], jnp.float32)
    b = jnp.asarray([-m / s for m, s in zip(mean, std)], jnp.float32)

    @jax.jit
    def infer(raw):
        x = raw.astype(jnp.float32) * a + b
        return model.module.apply(model.variables, x, train=False)

    n = (len(images) // batch) * batch or len(images)
    batch = min(batch, n)
    top1 = 0
    for i in range(0, n, batch):
        logits = np.asarray(infer(jnp.asarray(images[i:i + batch])))
        top1 += int((logits.argmax(1) == labels[i:i + batch]).sum())
    return {"n": n, "top1_err": 1 - top1 / n}


def verify_one(name, data_root, tol, batch=None):
    """Run the matching evaluator for ``name`` and gate vs the registry."""
    from pytorchcv_tpu.zoo.store import get_model_metainfo

    row = get_model_metainfo(name)
    pub = published_metric(row)
    if pub is None:
        return {"name": name, "status": "SKIP",
                "note": f"no released metric (dataset={row.get('dataset')})"}
    kind, pub_val, higher = pub
    ds = row["dataset"]

    try:
        if ds in ("in1k", "cub"):
            d = os.path.join(data_root, ds)
            images = np.load(os.path.join(d, "val_images.npy"), mmap_mode="r")
            labels = np.load(os.path.join(d, "val_labels.npy"))
            res = _load_tool("eval_imagenet").evaluate(
                name, images, labels, batch=batch or 100)
        elif ds == "cf":
            sub = _cf_sub(name)
            d = os.path.join(data_root, sub)
            images = np.load(os.path.join(d, "test_images.npy"))
            labels = np.load(os.path.join(d, "test_labels.npy"))
            stats = CF_STATS["svhn" if sub == "svhn" else "cifar"]
            res = _eval_classification_32(name, images, labels, stats,
                                          batch=batch or 200)
        elif ds in SEG_CLASSES:
            d = os.path.join(data_root, ds)
            images = np.load(os.path.join(d, "images.npy"), mmap_mode="r")
            masks = np.load(os.path.join(d, "masks.npy"), mmap_mode="r")
            res = _load_tool("eval_seg").evaluate(
                name, images, masks, SEG_CLASSES[ds], batch=batch or 8)
        elif ds == "cocohpe":
            d = os.path.join(data_root, ds)
            res = _load_tool("eval_pose").evaluate(
                name, np.load(os.path.join(d, "crops.npy"), mmap_mode="r"),
                np.load(os.path.join(d, "keypoints.npy")),
                np.load(os.path.join(d, "areas.npy")), batch=batch or 16)
        elif ds == "mcv":
            d = os.path.join(data_root, ds)
            res = _load_tool("eval_asr").evaluate(
                name, np.load(os.path.join(d, "waveforms.npy"), mmap_mode="r"),
                np.load(os.path.join(d, "lengths.npy")),
                json.load(open(os.path.join(d, "transcripts.json"))),
                batch=batch or 16)
        else:  # pragma: no cover - METRIC keys cover all datasets
            return {"name": name, "status": "SKIP", "note": f"dataset {ds}"}
    except FileNotFoundError as e:
        return {"name": name, "status": "NODATA", "note": str(e)}
    except Exception as e:                      # noqa: BLE001
        # One bad row (sha1 mismatch, conversion error, evaluator crash)
        # must not abort the whole --dataset sweep (ADVICE r4).
        return {"name": name, "status": "ERROR", "note": repr(e)[:200]}

    measured = res[kind] if kind in res else res.get(
        {"miou": "mIoU", "oks_ap": "AP", "wer": "wer"}.get(kind, kind))
    if measured is None:
        return {"name": name, "status": "ERROR",
                "note": f"metric {kind!r} missing from {sorted(res)}"}
    delta = measured - pub_val
    ok = _gate(measured, pub_val, higher, tol)
    return {"name": name, "dataset": ds, "metric": kind,
            "published": pub_val, "measured": round(float(measured), 5),
            "delta": round(float(delta), 5),
            "status": "PASS" if ok else "FAIL"}


def verify(names, data_root, tol=0.005, batch=None):
    results = []
    for name in names:
        r = verify_one(name, data_root, tol, batch=batch)
        print(json.dumps(r), flush=True)
        results.append(r)
    counts = {}
    for r in results:
        counts[r["status"]] = counts.get(r["status"], 0) + 1
    print("summary:", json.dumps(counts))
    return results


def _selftest():
    """Prove the loop offline: committed release-format fixture through the
    real download/sha1/convert path, synthetic eval, gate both ways."""
    import tempfile
    import zipfile
    import hashlib
    from unittest import mock

    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.zoo import store

    fixture = os.path.join(os.path.dirname(TOOLS), "tests", "fixtures",
                           "resnet20_cifar10-0000-3b091e6d.pth.zip")
    with zipfile.ZipFile(fixture) as zf:
        sha1 = hashlib.sha1(zf.read(zf.namelist()[0])).hexdigest()
    zip_bytes = open(fixture, "rb").read()

    class _Resp:
        status_code = 200

        def iter_content(self, chunk_size):
            yield zip_bytes

    meta = store.get_model_metainfo_dict()
    row = dict(meta["resnet20_cifar10"])
    row.update(sha1=sha1, error="0000", release="v0.0.fixture")

    with tempfile.TemporaryDirectory() as tmp, \
            mock.patch.dict(meta, {"resnet20_cifar10": row}), \
            mock.patch("requests.get", lambda *a, **k: _Resp()):
        # 1. The real pretrained path: download -> unzip -> sha1 -> convert.
        model = ptc.get_model("resnet20_cifar10", init=False)
        loaded = store.load_pretrained(model, root=tmp)
        assert os.path.exists(os.path.join(
            tmp, "resnet20_cifar10-0000-3b091e6d.pth"))

        # 2. Synthetic eval data labeled by the loaded weights themselves:
        #    the verifier must then measure ~0 top-1 error...
        rng = np.random.RandomState(0)
        images = rng.randint(0, 256, (256, 32, 32, 3), np.uint8)
        import jax.numpy as jnp  # label from the model's own argmax
        a = jnp.asarray([1 / (255 * s) for s in CF_STATS["cifar"][1]])
        b = jnp.asarray([-m / s for m, s in zip(*CF_STATS["cifar"])])
        logits = loaded.module.apply(
            loaded.variables,
            jnp.asarray(images).astype(jnp.float32) * a + b, train=False)
        labels = np.asarray(jnp.argmax(logits, 1))
        res = _eval_classification_32("resnet20_cifar10", images, labels,
                                      CF_STATS["cifar"], model=loaded)
        assert res["top1_err"] < 0.02, res

        # 3. ...and the gate must PASS on agreement / when better than
        #    published, and FAIL when measurably worse in every metric
        #    orientation.
        row["error"] = "%04d" % max(1, round(res["top1_err"] * 1e4))
        kind, pub, higher = published_metric(row)
        assert kind == "top1_err" and not higher
        assert _gate(res["top1_err"], pub, higher, tol=0.005)
        assert _gate(0.05, 0.10, False, 0.005)       # better err: pass
        assert not _gate(0.20, 0.10, False, 0.005)   # worse err: FAIL
        assert _gate(0.85, 0.80, True, 0.005)        # better mIoU: pass
        assert not _gate(0.70, 0.80, True, 0.005)    # worse mIoU: FAIL

    print("selftest: OK (fixture release -> convert -> eval -> gate)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--data", default=os.environ.get("PTCV_DATA", "/data"))
    ap.add_argument("--dataset", help="verify every released row of this "
                    "dataset (in1k/cf/cub/voc/ade20k/cs/cocoseg/cocohpe/mcv)")
    ap.add_argument("--tol", type=float, default=0.005,
                    help="absolute metric tolerance (fraction, default .005)")
    ap.add_argument("--batch", type=int)
    ap.add_argument("--selftest", action="store_true")
    args = ap.parse_args()

    if args.selftest:
        _selftest()          # no sys.exit: runpy-driven in CI
    else:
        names = args.names
        if args.dataset:
            from pytorchcv_tpu.zoo.store import get_model_metainfo_dict
            names += [n for n, r in
                      sorted(get_model_metainfo_dict().items())
                      if r.get("dataset") == args.dataset
                      and published_metric(r)]
        if not names:
            ap.error("give model names, --dataset, or --selftest")
        bad = sum(r["status"] in ("FAIL", "ERROR")
                  for r in verify(names, args.data, args.tol, args.batch))
        sys.exit(1 if bad else 0)
