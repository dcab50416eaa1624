"""Specialist-model throughput on the real chip: ASR, optical flow,
keypoints.

Fills the breadth rows the family benches don't cover: QuartzNet/Jasper
utterances+audio-seconds per second (RTFx), RAFT frame-pairs/s at a
KITTI-ish resolution, SuperPoint frames/s at VGA. All bf16 (the serving
precision); ASR numbers include the mel front-end (from_audio path).

Usage: python tools/exp_specialist_tpu.py [which ...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 10


def time_apply(fn, *args):
    """Scan-chained timing (see CLAUDE.md: block_until_ready does not
    sync through the axon tunnel); varies the first arg per iteration.

    Model variables MUST be passed through ``args`` (fn's trailing
    parameters), never closed over: closure constants are inlined into
    the HLO and a 332M-param model blows the tunnel's remote-compile
    request limit (HTTP 413)."""
    @functools.partial(jax.jit, static_argnums=0)
    def run_n(n, *a):
        def body(carry, i):
            first = a[0] + i.astype(a[0].dtype) * jnp.asarray(1e-4,
                                                              a[0].dtype)
            out = fn(first, *a[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            return carry + leaf.astype(jnp.float32).sum(), None
        carry, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                jnp.arange(n))
        return carry

    float(run_n(1, *args))
    float(run_n(ITERS, *args))
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); float(run_n(1, *args))
        t1 = time.time(); float(run_n(ITERS, *args))
        t2 = time.time()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (ITERS - 1))
    return best


def main():
    which = sys.argv[1:] or ["quartznet", "jasper", "raft", "superpoint"]
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    import pytorchcv_tpu as ptc
    rs = np.random.RandomState(0)

    if "quartznet" in which or "jasper" in which:
        names = []
        if "quartznet" in which:
            names.append(("quartznet15x5_en", 16, 15.0))
        if "jasper" in which:
            names.append(("jasperdr10x5_en", 8, 15.0))
        for name, B, secs in names:
            try:
                m = ptc.get_model(name).as_bfloat16()
                T = int(secs * 16000)
                audio = jnp.asarray(rs.randn(B, T) * 0.1, jnp.bfloat16)
                lens = jnp.full((B,), T, jnp.int32)

                def fn(a, l, v, m=m):
                    return m.module.apply(v, a, l, train=False)

                dt = time_apply(fn, audio, lens, m.variables)
                print(f"{name:18s} B{B} {secs:.0f}s audio: "
                      f"{dt*1e3:8.2f} ms  {B/dt:6.1f} utt/s  "
                      f"RTFx {B*secs/dt:7.0f}", flush=True)
            except Exception as e:
                print(f"{name} ERROR {type(e).__name__}: {e}", flush=True)

    if "jasper_int8" in which:
        # int8-storage ASR pipeline vs the bf16 rows above. The qtree is
        # passed as a jit ARGUMENT (333M params would 413 the tunnel's
        # remote-compile limit as an HLO constant).
        from pytorchcv_tpu.quant import calibrate_int8
        from pytorchcv_tpu.quant.jasper_int8 import prepare_int8_jasper
        for name, B, secs in (("jasperdr10x5_en", 8, 15.0),
                              ("jasper10x5", 8, 15.0)):
            try:
                m = ptc.get_model(name)
                T = int(secs * 16000)
                audio = jnp.asarray(rs.randn(B, T) * 0.1, jnp.float32)
                lens = jnp.full((B,), T, jnp.int32)
                scales = calibrate_int8(m, [(audio, lens)])
                fn, qtree = prepare_int8_jasper(m, scales)

                def f(a, l, qt, fn=fn):
                    return fn(qt, a, l)

                dt = time_apply(f, audio, lens, qtree)
                print(f"{name:18s} int8 B{B} {secs:.0f}s audio: "
                      f"{dt*1e3:8.2f} ms  {B/dt:6.1f} utt/s  "
                      f"RTFx {B*secs/dt:7.0f}", flush=True)
            except Exception as e:
                print(f"{name} int8 ERROR {type(e).__name__}: {e}",
                      flush=True)

    if "raft" in which:
        for name, (H, W), B in (("raft_small", (368, 768), 4),
                                ("raft_things", (368, 768), 2)):
            try:
                m = ptc.get_model(name, in_size=(H, W)).as_bfloat16()
                f1 = jnp.asarray(rs.rand(B, H, W, 3) * 255, jnp.bfloat16)
                f2 = jnp.asarray(rs.rand(B, H, W, 3) * 255, jnp.bfloat16)

                def fn(a, b, v, m=m):
                    return m.module.apply(v, a, b, train=False)

                dt = time_apply(fn, f1, f2, m.variables)
                print(f"{name:18s} B{B} {H}x{W}: {dt*1e3:8.2f} ms  "
                      f"{B/dt:6.1f} pairs/s", flush=True)
            except Exception as e:
                print(f"{name} ERROR {type(e).__name__}: {e}", flush=True)

    if "superpoint" in which:
        try:
            m = ptc.get_model("superpointnet").as_bfloat16()
            B, H, W = 8, 480, 640
            x = jnp.asarray(rs.rand(B, H, W, 1), jnp.bfloat16)

            def fn(a, v, m=m):
                return m.module.apply(v, a, train=False)

            dt = time_apply(fn, x, m.variables)
            print(f"superpointnet      B{B} {H}x{W}: {dt*1e3:8.2f} ms  "
                  f"{B/dt:6.1f} frames/s", flush=True)
        except Exception as e:
            print(f"superpointnet ERROR {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
