"""VMEM-residency attack on the HBM-bound int8-resnet50 segments.

The HLO census (exp_residual_fusion.py --census) shows the shipping
batch-384 program already writes ONLY int8 tensors >=20MB and that XLA's
memory-space assignment (MSA) places some 56/28-res intermediates in
alternate memory (S(1) = VMEM) even at 77-154 MB. Hypothesis: if the
HBM-bound early segments run per batch-CHUNK inside a lax.scan, each
chunk's intermediates (19-38 MB at chunk=24-48) fit VMEM outright, MSA
keeps the whole unit chain resident, and the stem/stage1/stage2 traffic
collapses toward stage-boundary-only (~0.7 ms of modeled slack vs the
measured 4.88+3.52 ms).

Variants (full e2e forward incl. head, bench-comparable timing):
  base        shipping single-call forward
  cN-s2       stem..stage2 scanned over N chunks; stages 3-4 + head full
  cN-s4       all four stages scanned over N chunks; head full batch

Run: python tools/exp_vmem_chunk.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 384
ITERS = int(os.environ.get("ITERS", "200"))


def _stem(R, f, sc, x):
    s_u1 = sc("features/stage1/unit1/body/conv1/conv")
    stem = f["init_block"]["conv"]
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), stem["kf"], (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y + stem["bias"], 0.0)
    return R._maxpool_i8(R._quant(y, s_u1)), s_u1


def _stages(R, f, sc, xq, s_in, c1s, lo, hi):
    """Units of stages [lo, hi) — shipped q_identity semantics."""
    all_names = sorted(k for k in f if k.startswith("stage"))
    yv = None
    for si in range(lo, hi):
        stage = all_names[si]
        unit_names = sorted(f[stage],
                            key=lambda u: int(u.replace("unit", "")))
        for ui, unit in enumerate(unit_names):
            uq = f[stage][unit]
            stride = 2 if (ui == 0 and si != 0) else 1
            body = uq["body"]
            prefix = f"features/{stage}/{unit}/body"
            nxt = None
            if ui + 1 < len(unit_names):
                nxt = f"features/{stage}/{unit_names[ui+1]}/body/conv1/conv"
            elif si + 1 < len(all_names):
                nxt = f"features/{all_names[si+1]}/unit1/body/conv1/conv"
            s_next = sc(nxt) if nxt else None
            s1, s2 = (stride, 1) if c1s else (1, stride)
            t = R._cell(xq, s_in, body["conv1"], s1, True,
                        sc(f"{prefix}/conv2/conv"))
            t = R._cell(t, sc(f"{prefix}/conv2/conv"), body["conv2"],
                        s2, True, sc(f"{prefix}/conv3/conv"))
            t = R._cell(t, sc(f"{prefix}/conv3/conv"), body["conv3"],
                        1, False)
            if "identity_conv" in uq:
                if s_next is not None:
                    qid = R._cell(xq, s_in, uq["identity_conv"], stride,
                                  False, s_next)
                    idf = qid.astype(jnp.float32) * (s_next / 127.0)
                else:
                    idf = R._cell(xq, s_in, uq["identity_conv"], stride,
                                  False)
            else:
                idf = (xq.astype(jnp.float32) *
                       (s_in / 127.0)).astype(jnp.bfloat16)
            yv = jnp.maximum(t.astype(jnp.float32) +
                             idf.astype(jnp.float32), 0.0)
            if s_next is not None:
                s_in = s_next
                xq = R._quant(yv, s_in)
    return xq, s_in, yv


def _head(qtree, yv):
    feat = jnp.mean(yv.astype(jnp.float32), axis=(1, 2))
    head = qtree["output"]
    logits = feat @ head["kernel"].astype(jnp.float32) + \
        head["bias"].astype(jnp.float32)
    return logits.astype(jnp.bfloat16)


def make_forward(scales, c1s, nchunks, split, unroll=False):
    """split: number of stages inside the per-chunk scan (0 = none);
    unroll: python-loop the chunks (no scan carry — scheduler may
    interleave chunk i+1's fetches under chunk i's compute)."""
    from pytorchcv_tpu.quant import resnet_int8 as R

    def fn(qtree, x):
        f = qtree["features"]
        sc = scales.__getitem__
        if nchunks <= 1:
            xq, s_in = _stem(R, f, sc, x)
            xq, s_in, yv = _stages(R, f, sc, xq, s_in, c1s, 0, 4)
            return _head(qtree, yv)

        b = x.shape[0]
        cb = b // nchunks
        xc = x.reshape(nchunks, cb, *x.shape[1:])

        def body(carry, xi):
            xq, s_in = _stem(R, f, sc, xi)
            xq, s_in, yv = _stages(R, f, sc, xq, s_in, c1s, 0, split)
            out = yv if split == 4 else xq
            return carry, out

        if unroll:
            outs = jnp.stack([body(None, xc[i])[1]
                              for i in range(nchunks)])
        else:
            _, outs = jax.lax.scan(body, jnp.zeros((), jnp.float32), xc)
        merged = outs.reshape(b, *outs.shape[2:])
        if split == 4:
            return _head(qtree, merged.astype(jnp.float32)
                         .astype(jnp.bfloat16))
        s_in = scales[f"features/stage{split+1}/unit1/body/conv1/conv"]
        xq, s_in, yv = _stages(R, f, sc, merged, s_in, c1s, split, 4)
        return _head(qtree, yv)

    return fn


def time_fn(fn, qtree, x):
    @functools.partial(jax.jit, static_argnums=2)
    def run_n(qtree, x, n):
        def body(carry, i):
            eps = i.astype(jnp.bfloat16) * jnp.asarray(1e-8, jnp.bfloat16)
            qt = dict(qtree)
            f = dict(qt["features"])
            ib = dict(f["init_block"])
            conv = dict(ib["conv"])
            conv["kf"] = conv["kf"] + eps
            ib["conv"] = conv
            f["init_block"] = ib
            qt["features"] = f
            y = fn(qt, x)
            return carry + y.astype(jnp.float32).sum(), None
        carry, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                jnp.arange(n))
        return carry

    ref = float(run_n(qtree, x, 1))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(run_n(qtree, x, ITERS))
        best = min(best, (time.time() - t0) / ITERS)
    return best * 1e3, ref


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.quant import calibrate_int8
    from pytorchcv_tpu.quant.resnet_int8 import (prepare_int8_resnet,
                                                 _resolve_conv1_stride)

    model = ptc.get_model("resnet50")
    scales = calibrate_int8(
        model, [jax.random.uniform(jax.random.PRNGKey(0),
                                   (8, 224, 224, 3))])
    _, qtree = prepare_int8_resnet(model, scales)
    c1s = _resolve_conv1_stride(model, None)
    x = jnp.asarray(np.random.RandomState(0).rand(BATCH, 224, 224, 3),
                    jnp.bfloat16)

    variants = [("base", 1, 0, False)]
    if "--unroll-only" in sys.argv:
        variants += [(f"u{nc}-s2", nc, 2, True) for nc in (2, 4)]
    else:
        for nc in (4, 8, 16):
            variants += [(f"c{nc}-s2", nc, 2, False),
                         (f"c{nc}-s4", nc, 4, False)]
        variants += [("u4-s2", 4, 2, True)]
    base_ref = None
    for tag, nc, split, unroll in variants:
        fn = make_forward(scales, c1s, nc, split, unroll)
        ms, ref = time_fn(fn, qtree, x)
        if base_ref is None:
            base_ref = ref
        drift = abs(ref - base_ref) / (abs(base_ref) + 1e-9)
        print(f"{tag:8s} {ms:7.3f} ms  {BATCH / ms * 1e3:9.1f} img/s  "
              f"logit-drift {drift:.2e}", flush=True)


if __name__ == "__main__":
    main()
