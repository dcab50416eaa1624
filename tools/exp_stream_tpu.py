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
    jax.block_until_ready(last)
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
