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

MEASURED (v5e via axon tunnel, 2026-08-18, T=24 step=6):
  240x432: 78.7 s  (0.30 frames/s)
  64x128: 102.0 s  (0.24 frames/s)   <- device work ~0.2 s!
The wall time is RESOLUTION-INDEPENDENT: it is host-dispatch latency
through the tunnel (hundreds of tiny buffer/slice/window ops, each a
round trip), not device time. Per-stage device programs at 240x432 sum
to ~5.2 s per 24 frames (tools/exp_stream_stages.py: raft 2x232 ms,
rfc 615 ms, ip 314 ms, transformer ~5x754 ms) => ~4.6 frames/s expected
with a colocated host (production TPU-VM topology).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def run_once(frames, masks, raft, rfc, pp, step):
    from pytorchcv_tpu.models.propainter_stream import (ProPainterIterator,
                                                        TensorSequencer)
    it = ProPainterIterator(frames=TensorSequencer(frames),
                            masks=TensorSequencer(masks),
                            raft_model=raft, pprfc_model=rfc,
                            pp_model=pp, step=step)
    done = 0
    last = None
    for chunk in it:
        done += chunk.shape[0]
        last = chunk
    # block_until_ready does NOT synchronize through the axon tunnel
    # (CLAUDE.md); force a real device->host read of a scalar so the
    # wall clock covers all enqueued work.
    float(last.sum())
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
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        done = run_once(frames, masks, raft, rfc, pp, step)
        best = min(best, time.time() - t0)
    print(f"{H}x{W}, {T} frames, step {step}: "
          f"{best:.2f} s -> {done / best:.2f} frames/s", flush=True)


if __name__ == "__main__":
    main()
