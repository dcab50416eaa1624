"""End-to-end streaming video inpainting throughput on the real chip.

Runs the full five-stage ProPainter pipeline (RAFT flow -> recurrent
flow completion -> image propagation -> sparse transformer -> mask
blend; reference propainter_stream.py:336) through ProPainterIterator
at a production-ish resolution and reports frames/sec.

The pipeline is host-driven (pull-based sequencers issuing jitted
window programs), so wall-clock includes host dispatch through the axon
tunnel — the number is a lower bound on colocated-host throughput. The
first pass compiles every window shape; the timed pass reuses them.

Usage: python tools/exp_stream_tpu.py [H W T step]

MEASURED (v5e via axon tunnel):
  2026-08-18 (pre c2e0736, sequencers ran nets op-by-op):
    240x432: 78.7 s (0.30 f/s); 64x128: 102.0 s (0.24 f/s) —
    resolution-independent host-dispatch storm.
  2026-08-19 (sequencers through the pre-jitted Model path, T=24 step=6):
    240x432 host_buffers=False: 3.89 s -> 6.17 frames/s  == the
      device-side stage sum (~3.9 s/24f, exp_stream_stages.py): the
      pipeline is NO LONGER host-bound; dispatch census
      (exp_dispatch_count.py): ~5 dispatches/window, 0.4-0.9 ms each.
    240x432 host_buffers=True: 35.61 s -> 0.67 frames/s — every window
      round-trips input/result bytes over the ~20-35 MB/s tunnel;
      host buffering only pays on latency-bound-but-wide links.
  2026-08-21 (round 5, CPU time-shared with the SERVE_FULL sweep):
    240x432 host_buffers=False: 1.56 s -> **15.35 frames/s** (2.5x the
      r3 figure). The r3 SoftSplit/SoftComp-as-single-convs + static FFN
      normalizer rework (7085740) landed AFTER the 6.17 f/s measurement
      and was never re-measured e2e; the transformer window is now
      196 ms device-only / 220 ms dispatch-style at t=19/l_t=11
      (tools/exp_pp_accounting.py — which also showed the old
      per-submodule figures each carried ~1 tunnel RTT).
    240x432 host_buffers=True: 39.94 s -> 0.60 frames/s (unchanged
      tunnel-width bound).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def run_once(frames, masks, raft, rfc, pp, step, host_buffers=False):
    from pytorchcv_tpu.models.propainter_stream import (ProPainterIterator,
                                                        TensorSequencer)
    it = ProPainterIterator(frames=TensorSequencer(frames),
                            masks=TensorSequencer(masks),
                            raft_model=raft, pprfc_model=rfc,
                            pp_model=pp, step=step,
                            host_buffers=host_buffers)
    done = 0
    last = None
    for chunk in it:
        done += chunk.shape[0]
        last = chunk
    # block_until_ready does NOT synchronize through the axon tunnel
    # (CLAUDE.md); force a real device->host read of a scalar so the
    # wall clock covers all enqueued work.
    float(jnp.asarray(last).sum())
    return done


def main():
    args = [int(a) for a in sys.argv[1:]]
    H, W, T, step = (args + [240, 432, 24, 6][len(args):])
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    import pytorchcv_tpu as ptc

    rs = np.random.RandomState(0)
    frames = jnp.asarray((rs.rand(T, H, W, 3) * 255).astype(np.float32))
    masks = jnp.asarray((rs.rand(T, H, W, 1) > 0.85).astype(np.float32))

    raft = ptc.get_model("raft_small", in_size=(H, W), iters=12)
    rfc = ptc.get_model("propainter_rfc", in_size=(H, W))
    pp = ptc.get_model("propainter", in_size=(H, W))

    t0 = time.time()
    run_once(frames, masks, raft, rfc, pp, step)     # compile pass
    print(f"compile+run pass: {time.time() - t0:.1f} s", flush=True)
    for host in (False, True):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            done = run_once(frames, masks, raft, rfc, pp, step,
                            host_buffers=host)
            best = min(best, time.time() - t0)
        print(f"{H}x{W}, {T} frames, step {step}, "
              f"host_buffers={host}: "
              f"{best:.2f} s -> {done / best:.2f} frames/s", flush=True)


if __name__ == "__main__":
    main()
