"""Streaming video inpainting: the full five-stage ProPainter pipeline
over an unbounded frame sequence (reference propainter_stream.py:336).

    python examples/inpaint_stream.py

RAFT flow -> recurrent flow completion -> image propagation -> sparse
transformer -> mask blend, each stage a lazily-evaluated window sequencer
whose buffer is trimmed as the iterator advances — memory stays bounded
no matter how long the video is. Uses random-init weights and the real
RAFT model at a small size so it runs anywhere; swap ``pretrained=True``
and real frames for production.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

import pytorchcv_tpu as ptc
from pytorchcv_tpu.models.propainter_stream import (ProPainterIterator,
                                                    TensorSequencer)


def main():
    T, H, W = 12, 64, 128  # RAFT's 4-level corr pyramid needs H/8 >= 8
    rs = np.random.RandomState(0)
    frames = jnp.asarray((rs.rand(T, H, W, 3) * 255).astype(np.float32))
    masks = jnp.asarray((rs.rand(T, H, W, 1) > 0.85).astype(np.float32))

    raft = ptc.get_model("raft_small", in_size=(H, W), iters=4)
    rfc = ptc.get_model("propainter_rfc", in_size=(H, W))
    pp = ptc.get_model("propainter", in_size=(H, W))

    # host_buffers=True keeps stage buffers in host numpy (one device
    # dispatch per window + one result fetch) — same frames bit-for-bit;
    # useful when the host<->device link is latency-bound.
    it = ProPainterIterator(frames=TensorSequencer(frames),
                            masks=TensorSequencer(masks),
                            raft_model=raft, pprfc_model=rfc,
                            pp_model=pp, step=6)
    done = 0
    for chunk in it:
        done += chunk.shape[0]
        print(f"inpainted frames {done - chunk.shape[0]}..{done - 1}  "
              f"chunk {chunk.shape}")
    print(f"video complete: {done}/{T} frames")


if __name__ == "__main__":
    main()
