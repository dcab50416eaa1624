"""Sub-stage breakdown of the ProPainter transformer window.

The streaming pipeline's wall time is dominated by the transformer
window (~570 ms x ~5 windows of the ~3.9 s / 24-frame step at 240x432,
STATUS.md). This times the window's constituent submodules standalone at
the shapes the IT sequencer actually issues (t neighbor+ref frames,
l_t local frames, 240x432 -> 60x108 features), to locate the next
optimization target: Encoder / feat-prop (deform) / SoftSplit /
transformer blocks / SoftComp / Decoder.

Usage: python tools/exp_pp_breakdown.py [t l_t]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(label, fn, *args, iters=4):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
        best = min(best, time.time() - t0)
    print(f"{label:34s} {best * 1e3:9.1f} ms", flush=True)
    return best


def main():
    t = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    l_t = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    H, W = 240, 432
    h, w = H // 4, W // 4            # encoder feature grid 60x108
    mh, mw = 20, 36                  # pooled token grid (k7 s3 p3)
    C, D = 128, 512

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    from pytorchcv_tpu.models.propainter import (
        Encoder, Decoder, SoftSplit, SoftComp,
        TemporalSparseTransformerBlock)
    from pytorchcv_tpu.models.propainter_ip import BidirectionalPropagation
    from pytorchcv_tpu.nn.activ import lambda_leakyrelu, lambda_tanh

    rng = jax.random.PRNGKey(0)
    act = lambda_leakyrelu(0.2)

    def bf16(tree):
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if getattr(a, "dtype", None) == jnp.float32 else a, tree)

    def bench(label, mod, *args):
        args = bf16(args)
        vs = bf16(mod.init(rng, *args))
        fn = jax.jit(lambda v, *a: mod.apply(v, *a))
        return timeit(label, fn, vs, *args)

    total = 0.0
    # 1. Encoder over all t frames
    enc_in = jnp.zeros((t, H, W, 5))
    total += bench(f"encoder ({t}f 240x432)",
                   Encoder(activation=act), enc_in)
    # 2. Learnable bidirectional feature propagation over local frames
    feat = jnp.zeros((1, l_t, h, w, C))
    flow = jnp.zeros((1, l_t - 1, h, w, 2))
    pmask = jnp.zeros((1, l_t, h, w, 2))
    total += bench(f"feat_prop ({l_t}f deform)",
                   BidirectionalPropagation(channels=C, learnable=True),
                   feat, flow, flow, pmask)
    # 3. SoftSplit token embed over all t frames
    sfeat = jnp.zeros((t, h, w, C))
    ss = SoftSplit(hidden_dim=D)
    args_ss = (sfeat, 1, (h, w))
    vs_ss = bf16(ss.init(rng, *bf16(args_ss)))
    total += timeit("soft_split",
                    jax.jit(lambda v, x: ss.apply(v, x, 1, (h, w))),
                    vs_ss, bf16(sfeat))
    # 4. Transformer blocks (depth 8)
    tok = jnp.zeros((1, t, mh, mw, D))
    l_mask = jnp.zeros((1, l_t, mh, mw, 1))
    tr = TemporalSparseTransformerBlock(dim=D, depth=8)
    vs_tr = bf16(tr.init(rng, *bf16((tok, (h, w), l_mask))))
    total += timeit(
        "transformer blocks (8)",
        jax.jit(lambda v, x, m: tr.apply(v, x, (h, w), m)),
        vs_tr, bf16(tok), bf16(l_mask))
    # 5. SoftComp back to features
    sc = SoftComp(channels=C)
    vs_sc = bf16(sc.init(rng, *bf16((tok, t, (h, w)))))
    total += timeit(
        "soft_comp",
        jax.jit(lambda v, x: sc.apply(v, x, t, (h, w))),
        vs_sc, bf16(tok))
    # 6. Decoder over local frames
    dfeat = jnp.zeros((l_t, h, w, C))
    total += bench(f"decoder ({l_t}f)",
                   Decoder(mid_channels=64, out_channels=3, activation=act,
                           final_activation=lambda_tanh()), dfeat)
    print(f"{'sum':34s} {total * 1e3:9.1f} ms")


if __name__ == "__main__":
    main()
