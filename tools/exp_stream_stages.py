"""Per-stage timing of the streaming inpainting pipeline on the chip.

The e2e ProPainterIterator (tools/exp_stream_tpu.py) measured ~0.3
frames/s at 240x432 BEFORE AND AFTER the RAFT lookup became 56x faster
— so RAFT is not the bottleneck. This times each stage's jitted program
in isolation at the shapes the iterator actually issues (T=24, step 6),
to locate where the time goes: RAFT window / RFC completion / image
propagation / transformer window / host orchestration (= e2e minus the
sum).

Usage: python tools/exp_stream_stages.py [H W] [--f32]
(bf16 models by default — the serving precision; --f32 for the
reference numerics.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(label, fn, *args, iters=3):
    out = fn(*args)                                      # compile
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        # force through the tunnel with a tiny host pull
        float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
        best = min(best, time.time() - t0)
    print(f"{label:28s} {best*1e3:9.1f} ms", flush=True)
    return best


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    f32 = "--f32" in sys.argv
    H, W = (int(a) for a in args[:2]) if len(args) >= 2 else (240, 432)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.models.raft import (
        calc_bidirectional_optical_flow_on_video_by_raft)
    from pytorchcv_tpu.models.propainter_rfc import (
        calc_bidirectional_opt_flow_completion_by_pprfc)

    rs = np.random.RandomState(0)

    def get(name, **kw):
        m = ptc.get_model(name, **kw)
        return m if f32 else m.as_bfloat16()

    print(f"precision: {'f32' if f32 else 'bf16'}", flush=True)
    raft = get("raft_small", in_size=(H, W), iters=12)
    rfc = get("propainter_rfc", in_size=(H, W))
    ip = get("propainter_ip", in_size=(H, W))
    pp = get("propainter", in_size=(H, W))

    # RAFT window (streaming window_size=12 at <=640px)
    frames12 = jnp.asarray(rs.rand(12, H, W, 3) * 255, jnp.float32)
    timeit("raft window (12 frames)",
           lambda f: calc_bidirectional_optical_flow_on_video_by_raft(
               lambda a, b: raft(a, b), f), frames12)

    # RFC completion over the full 24-frame clip (window_size 80 > T)
    flows = jnp.asarray(rs.randn(23, H, W, 4), jnp.float32)
    fmasks = jnp.asarray((rs.rand(23, H, W, 2) > 0.85).astype(np.float32))
    timeit("rfc completion (23 flows)",
           lambda fl, fm: calc_bidirectional_opt_flow_completion_by_pprfc(
               lambda a, b: rfc(a, b), fl, fm), flows, fmasks)

    # Image propagation over the full clip
    frames24 = jnp.asarray(rs.rand(24, H, W, 3), jnp.float32)
    masks24 = jnp.asarray((rs.rand(24, H, W, 1) > 0.85).astype(np.float32))
    cflows = jnp.asarray(rs.randn(23, H, W, 4), jnp.float32)
    timeit("image propagation (24 fr)",
           lambda f, m, c: ip(f, m, c, "nearest"), frames24, masks24,
           cflows)

    # One transformer window: 11 neighbors + 8 refs, 11 local flows
    nfr = 19
    mf = jnp.asarray(rs.rand(1, nfr, H, W, 3), jnp.float32)
    mu = jnp.asarray((rs.rand(1, nfr, H, W, 1) > 0.85).astype(np.float32))
    mi = jnp.asarray((rs.rand(1, nfr, H, W, 1) > 0.85).astype(np.float32))
    cf = jnp.asarray(rs.randn(1, 10, H, W, 4), jnp.float32)
    timeit("transformer window (19 fr)",
           lambda a, b, c, d: pp(a, b, c, d, 11), mf, mu, mi, cf)


if __name__ == "__main__":
    main()
