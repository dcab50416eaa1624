"""Locate int8-resnet step time by cumulative truncation.

Times the real pipeline (quant.resnet_int8 internals, same consts)
truncated after the stem and after each stage; differences = per-stage
cost. More robust than trace parsing through the axon tunnel.

Usage: python tools/exp_profile_stages.py [model_name] [batch]
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
ITERS = 150


def time_fn(fn, qtree, x):
    # Same hoisting guard as bench.py: perturb the 18 KB stem kernel
    # (zero-traffic i-dependence) instead of the 116 MB input, whose
    # per-iteration add inflated every truncation level ~0.14 ms and
    # biased the per-stage deltas.
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

    float(run_n(qtree, x, ITERS))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(run_n(qtree, x, ITERS))
        best = min(best, (time.time() - t0) / ITERS)
    return best * 1e3


def truncated_forward(scales, conv1_stride, upto):
    """Forward through the stem and the first ``upto`` stages (the real
    _forward's math, loop-limited); reduces to a scalar-friendly tensor."""
    from pytorchcv_tpu.quant import resnet_int8 as R

    def fn(qtree, x):
        f = qtree["features"]
        sc = scales.__getitem__
        s_u1 = sc("features/stage1/unit1/body/conv1/conv")
        stem = f["init_block"]["conv"]
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), stem["kf"], (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = jnp.maximum(y + stem["bias"], 0.0)
        xq = R._maxpool_i8(R._quant(y, s_u1))
        s_in = s_u1
        stage_names = sorted(k for k in f if k.startswith("stage"))[:upto]
        all_names = sorted(k for k in f if k.startswith("stage"))
        for si, stage in enumerate(stage_names):
            unit_names = sorted(f[stage],
                                key=lambda u: int(u.replace("unit", "")))
            for ui, unit in enumerate(unit_names):
                uq = f[stage][unit]
                stride = 2 if (ui == 0 and si != 0) else 1
                body = uq["body"]
                prefix = f"features/{stage}/{unit}/body"
                nxt = None
                if ui + 1 < len(unit_names):
                    nxt = (f"features/{stage}/{unit_names[ui+1]}"
                           "/body/conv1/conv")
                elif si + 1 < len(all_names):
                    nxt = (f"features/{all_names[si+1]}/unit1"
                           "/body/conv1/conv")
                s_next = sc(nxt) if nxt else None
                grouped = (body["conv2"]["wq"].shape[2] !=
                           body["conv1"]["wq"].shape[3])
                c1s = False if grouped else conv1_stride
                s1, s2 = (stride, 1) if c1s else (1, stride)
                # Shipped tail exactly (resnet_int8._forward q_identity
                # path): int8 downsample-identity write, bf16 casts, f32
                # add, quant to the next unit's scale.
                t = R._cell(xq, s_in, body["conv1"], s1, True,
                            sc(f"{prefix}/conv2/conv"))
                t = R._cell(t, sc(f"{prefix}/conv2/conv"), body["conv2"],
                            s2, True, sc(f"{prefix}/conv3/conv"))
                t = R._cell(t, sc(f"{prefix}/conv3/conv"), body["conv3"],
                            1, False)
                if "identity_conv" in uq:
                    if s_next is not None:
                        qid = R._cell(xq, s_in, uq["identity_conv"],
                                      stride, False, s_next)
                        idf = qid.astype(jnp.float32) * (s_next / 127.0)
                    else:
                        idf = R._cell(xq, s_in, uq["identity_conv"],
                                      stride, False)
                else:
                    idf = (xq.astype(jnp.float32) *
                           (s_in / 127.0)).astype(jnp.bfloat16)
                yv = jnp.maximum(t.astype(jnp.float32) +
                                 idf.astype(jnp.float32), 0.0)
                if s_next is not None:
                    s_in = s_next
                    xq = R._quant(yv, s_in)
        return (xq if upto < 4 else yv).astype(jnp.float32).sum(
            axis=(1, 2, 3))
    return fn


def main():
    global BATCH
    name = sys.argv[1] if len(sys.argv) > 1 else "resnet50"
    if len(sys.argv) > 2:
        BATCH = int(sys.argv[2])
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.quant import calibrate_int8
    from pytorchcv_tpu.quant.resnet_int8 import (prepare_int8_resnet,
                                                 _resolve_conv1_stride)

    model = ptc.get_model(name)
    scales = calibrate_int8(
        model, [jax.random.uniform(jax.random.PRNGKey(0),
                                   (8, 224, 224, 3))])
    gb = os.environ.get("GB")
    gb = int(gb) if gb else 32
    fn_full, qtree = prepare_int8_resnet(model, scales, group_block=gb)
    c1s = _resolve_conv1_stride(model, None)
    x = jnp.asarray(np.random.RandomState(0).rand(BATCH, 224, 224, 3),
                    jnp.bfloat16)

    prev = 0.0
    for upto in range(0, 5):
        fn = truncated_forward(scales, c1s, upto)
        ms = time_fn(fn, qtree, x)
        label = "stem+pool" if upto == 0 else f"+stage{upto}"
        print(f"{label:10s} cumulative {ms:7.3f} ms   "
              f"delta {ms - prev:7.3f} ms")
        prev = ms
    full = time_fn(fn_full, qtree, x)
    print(f"{'full':10s} cumulative {full:7.3f} ms   "
          f"delta {full - prev:7.3f} ms (head+pool)")


if __name__ == "__main__":
    main()
