"""Pin the streaming-pipeline host-dispatch hypothesis quantitatively.

STATUS round-2/3: streaming e2e through the axon tunnel is ~0.3 f/s and
resolution-independent while device work sums to ~6 f/s.  Hypothesis:
every eager jnp op / jit call in the host-driven sequencer loop is one
tunnel round trip, and the wall time is (dispatch count) x (per-dispatch
latency), not device time.

This measures all three terms independently:
  1. per-dispatch latency: N chained tiny eager adds + one blocking read;
  2. host<->device bandwidth through the tunnel (device_put / np.asarray);
  3. the pipeline's actual dispatch count, by wrapping jax's C++ pjit
     fastpath constructor (``jax._src.pjit._cpp_pjit``) with a counting
     shim BEFORE anything is jitted — this counts eager ops, jit calls,
     slices, and concats alike (verified: ones/add/concat/slice each +1).

Usage: python tools/exp_dispatch_count.py [H W T step]
(default 64x128x24 step 6 — device work is negligible there, isolating
dispatch overhead).

MEASURED (v5e via axon tunnel, 2026-08-19, 64x128 T=12 step=6):
  per-dispatch latency 0.42-0.91 ms; bandwidth ~20-35 MB/s each way;
  warm pipeline pass: wall 0.40 s, 129 dispatches (3.1 ms/dispatch
  incl. device work) -> 30.2 frames/s e2e.
CONCLUSION: after routing sequencers through the pre-jitted Model path
(commit c2e0736), the pipeline is NOT dispatch-storm-bound anymore —
129 dispatches/clip is ~5 per window call, and the earlier ~0.3 f/s
resolution-independent wall (STATUS r2) is stale: it was measured when
each flax primitive dispatched separately. Remaining e2e gap vs pure
device time is per-dispatch latency (~0.4 s/clip) + result fetches.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# ---- install the dispatch counter BEFORE importing jax-using code ----
import jax._src.pjit as _pj

DISPATCHES = [0]
_orig_cpp_pjit = _pj._cpp_pjit


class _CountingPjit:
    """Callable proxy over the C++ pjit fastpath: counts calls, delegates
    every attribute (``trace``, ``lower``, ``clear_cache``, ...)."""

    def __init__(self, fp):
        object.__setattr__(self, "_fp", fp)

    def __call__(self, *args, **kwargs):
        DISPATCHES[0] += 1
        return self._fp(*args, **kwargs)

    def __getattr__(self, name):
        return getattr(object.__getattribute__(self, "_fp"), name)


def _counting_cpp_pjit(fun, *a, **k):
    return _CountingPjit(_orig_cpp_pjit(fun, *a, **k))


_pj._cpp_pjit = _counting_cpp_pjit

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def measure_dispatch_latency(n=200):
    x = jnp.zeros((8,), jnp.float32)
    x = x + 1.0
    float(x[0])  # compile + warm
    t0 = time.time()
    for _ in range(n):
        x = x + 1.0
    float(x[0])
    return (time.time() - t0) / n


def measure_bandwidth(mb=8, reps=3):
    a = np.random.rand(mb * 1024 * 1024 // 4).astype(np.float32)
    d = jax.device_put(a)
    np.asarray(d)  # warm
    up = down = float("inf")
    for _ in range(reps):
        t0 = time.time()
        d = jax.device_put(a)
        d.block_until_ready()
        up = min(up, time.time() - t0)
        t0 = time.time()
        np.asarray(d)
        down = min(down, time.time() - t0)
    return mb / up, mb / down


def run_pipeline(frames, masks, raft, rfc, pp, step):
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
    float(jnp.asarray(last).sum())  # force a real device->host read
    return done


def main():
    args = [int(a) for a in sys.argv[1:]]
    H, W, T, step = (args + [64, 128, 24, 6][len(args):])
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    import pytorchcv_tpu as ptc

    lat = measure_dispatch_latency()
    up_bw, down_bw = measure_bandwidth()
    print(f"per-dispatch latency: {lat * 1e3:.2f} ms; "
          f"bandwidth up {up_bw:.1f} MB/s down {down_bw:.1f} MB/s",
          flush=True)

    rs = np.random.RandomState(0)
    frames = jnp.asarray((rs.rand(T, H, W, 3) * 255).astype(np.float32))
    masks = jnp.asarray((rs.rand(T, H, W, 1) > 0.85).astype(np.float32))

    raft = ptc.get_model("raft_small", in_size=(H, W), iters=12)
    rfc = ptc.get_model("propainter_rfc", in_size=(H, W))
    pp = ptc.get_model("propainter", in_size=(H, W))

    t0 = time.time()
    run_pipeline(frames, masks, raft, rfc, pp, step)  # compile pass
    print(f"compile+run pass: {time.time() - t0:.1f} s", flush=True)

    DISPATCHES[0] = 0
    t0 = time.time()
    done = run_pipeline(frames, masks, raft, rfc, pp, step)
    wall = time.time() - t0
    n = DISPATCHES[0]
    print(f"{H}x{W}, {T} frames, step {step}: wall {wall:.2f} s, "
          f"{n} dispatches -> {wall / n * 1e3:.2f} ms/dispatch "
          f"(predicted from latency alone: {n * lat:.2f} s; "
          f"{done / wall:.2f} frames/s)", flush=True)


if __name__ == "__main__":
    main()
