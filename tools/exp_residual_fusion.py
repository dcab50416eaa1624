"""Stage1/2 residual-traffic attack (VERDICT r4 item 5): evidence first.

Step 1 (--census): compile the exact bench.py forward (batch 384) and
inventory the optimized HLO's materialized buffers — every fusion/conv
output that lands in HBM, bucketed by shape/dtype, with byte sizes. The
question: do the stage1/2 unit outputs materialize in bf16/f32 (2-4 bytes
per element) anywhere, or does every unit boundary already write int8?
The modeled slack (stage1 4.88 vs ~4.5 ms, stage2 3.52 vs ~3.2) is ~0.7 ms
~= 570 MB at 819 GB/s — about one stage1-size bf16 tensor per unit pair.

Step 2 (--ab): A/B the per-stage quantized-domain residual carry
(q_residual restricted to the HBM-bound stages 1-2, bf16 adds kept in the
compute-bound stages 3-4) against the shipping default. The full-network
q_residual was measured-and-rejected in r2 (19.9k vs 22.1k); the
per-stage variant is new.

Run on the real chip: python tools/exp_residual_fusion.py --census --ab
"""

import functools
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 384
ITERS = int(os.environ.get("ITERS", "300"))

_DT_BYTES = {"s8": 1, "u8": 1, "pred": 1, "bf16": 2, "f16": 2, "s16": 2,
             "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8}


def _build(q_residual=False):
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.quant import calibrate_int8
    from pytorchcv_tpu.quant.resnet_int8 import prepare_int8_resnet

    model = ptc.get_model("resnet50")
    scales = calibrate_int8(
        model,
        [jax.random.uniform(jax.random.PRNGKey(0), (8, 224, 224, 3))])
    fn, qtree = prepare_int8_resnet(model, scales, q_residual=q_residual)
    return fn, qtree


def census():
    fn, qtree = _build()
    x = jnp.asarray(np.random.RandomState(0).rand(BATCH, 224, 224, 3),
                    jnp.bfloat16)
    compiled = jax.jit(fn).lower(qtree, x).compile()
    txt = compiled.as_text()
    print(f"optimized HLO: {len(txt) / 1e6:.1f} MB text")

    # Root-level instructions in ENTRY + while bodies materialize their
    # outputs; count every op result >= 20 MB.
    shape_re = re.compile(
        r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*((?:\([^)]*\))|"
        r"(?:[a-z0-9]+\[[\d,]*\][^ ]*))\s*([a-z\-]+)\(")
    tuple_el = re.compile(r"([a-z0-9]+)\[([\d,]*)\]")

    def nbytes(dt, dims):
        b = _DT_BYTES.get(dt)
        if b is None:
            return 0
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        return n * b

    buckets = defaultdict(lambda: [0, 0])   # (op, shape) -> [count, bytes]
    in_fusion_body = False
    for line in txt.splitlines():
        # computation headers: "%name (args) -> type {" — ops inside a
        # fusion body never materialize; only top-level computations
        # (ENTRY, while bodies/conds) write HBM buffers.
        if line and not line[0].isspace() and "{" in line:
            in_fusion_body = ("fused_computation" in line or
                              line.lstrip("%").startswith(
                                  ("region_", "scalar_", "and.", "or.",
                                   "add.", "max.", "min.")))
            continue
        if in_fusion_body:
            continue
        m = shape_re.match(line)
        if not m:
            continue
        name, shape, op = m.groups()
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast"):
            continue
        total = sum(nbytes(dt, dims)
                    for dt, dims in tuple_el.findall(shape))
        if total >= 20e6:
            buckets[(op, shape[:90])][0] += 1
            buckets[(op, shape[:90])][1] += total

    print(f"\n{'bytes(MB)':>10} {'count':>5}  op / shape")
    grand = 0
    for (op, shape), (cnt, tot) in sorted(buckets.items(),
                                          key=lambda kv: -kv[1][1]):
        grand += tot
        print(f"{tot / 1e6:10.0f} {cnt:5d}  {op} {shape}")
    print(f"\ntotal materialized >=20MB: {grand / 1e9:.2f} GB "
          f"(one forward, batch {BATCH})")
    return txt


def _time_variant(tag, **kw):
    fn, qtree = _build(**kw)
    x = jnp.asarray(np.random.RandomState(0).rand(BATCH, 224, 224, 3),
                    jnp.bfloat16)

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
    print(f"{tag:28s} {BATCH / best:9.1f} img/s   ({best * 1e3:.3f} ms) "
          f"logit-sum {ref:.1f}")
    return BATCH / best


def ab():
    base = _time_variant("baseline (bf16 residual)")
    v12 = _time_variant("q_residual stages 1-2", q_residual={"stage1",
                                                            "stage2"})
    v1 = _time_variant("q_residual stage 1", q_residual={"stage1"})
    vall = _time_variant("q_residual all", q_residual=True)
    print(f"\nstage1-2 vs baseline: {v12 / base:.3f}x; "
          f"stage1 {v1 / base:.3f}x; all {vall / base:.3f}x")


if __name__ == "__main__":
    if "--census" in sys.argv:
        census()
    if "--ab" in sys.argv:
        ab()
