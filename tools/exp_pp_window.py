"""Where the 570 ms ProPainter transformer window goes, submodule by
submodule (on-chip, 240x432, the streaming window shape: 19 frames =
11 local + 8 refs).

FLOP roofline for the token path (19f x 720 tokens, hidden 512, depth 8:
FFN ~880 GFLOP, attention ~500 GFLOP) is ~7 ms bf16 — if the window
measures 570 ms the time must be in the convs / the sequential
deform-align feature propagation / fold-unfold, not the matmuls.
This times each stage standalone at its in-context shape.

Usage: python tools/exp_pp_window.py [H W]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(label, fn, *args, iters=3):
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
    args = [int(a) for a in sys.argv[1:]]
    H, W = (args + [240, 432][len(args):])[:2]
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    import pytorchcv_tpu as ptc

    rs = np.random.RandomState(0)
    T, LT = 19, 11
    h4, w4 = H // 4, W // 4
    C, HID = 128, 512

    # ---- full window at each depth (depth ablation) ----
    def window_inputs():
        mf = jnp.asarray(rs.rand(1, T, H, W, 3), jnp.float32)
        mu = jnp.asarray((rs.rand(1, T, H, W, 1) > 0.85).astype(np.float32))
        mi = jnp.asarray((rs.rand(1, T, H, W, 1) > 0.85).astype(np.float32))
        cf = jnp.asarray(rs.randn(1, LT - 1, H, W, 4), jnp.float32)
        return mf, mu, mi, cf

    mf, mu, mi, cf = window_inputs()
    for depth in (8, 2):
        pp = ptc.get_model("propainter", in_size=(H, W),
                           depth=depth).as_bfloat16()
        timeit(f"full window depth={depth}",
               lambda a, b_, c_, d_, m=pp: m(a, b_, c_, d_, LT),
               mf, mu, mi, cf)

    # ---- standalone submodules at in-context shapes ----
    from flax.core import freeze
    from pytorchcv_tpu.models.propainter import (Encoder, Decoder,
                                                 SoftSplit, SoftComp)
    from pytorchcv_tpu.models.propainter_ip import BidirectionalPropagation
    from pytorchcv_tpu.nn import lambda_leakyrelu, lambda_tanh

    def bench_module(label, module, *xs, **kw):
        vars_ = module.init(jax.random.PRNGKey(0), *xs, train=False, **kw)
        vars_ = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, vars_)

        @jax.jit
        def run(v, *inp):
            return module.apply(v, *inp, train=False, **kw)

        xs_b = tuple(x.astype(jnp.bfloat16) for x in xs)
        timeit(label, lambda *inp: run(vars_, *inp), *xs_b)

    act = lambda_leakyrelu(0.2)
    enc_in = jnp.asarray(rs.rand(T, H, W, 5), jnp.float32)
    bench_module("encoder (19 fr)", Encoder(activation=act), enc_in)

    feat = jnp.asarray(rs.rand(1, LT, h4, w4, C), jnp.float32)
    ffl = jnp.asarray(rs.randn(1, LT - 1, h4, w4, 2), jnp.float32) * 2
    fbl = jnp.asarray(rs.randn(1, LT - 1, h4, w4, 2), jnp.float32) * 2
    pmask = jnp.asarray(
        (rs.rand(1, LT, h4, w4, 2) > 0.85).astype(np.float32))
    bench_module("feat prop (11 fr, deform x2)",
                 BidirectionalPropagation(channels=C, learnable=True),
                 feat, ffl, fbl, pmask)

    ss = SoftSplit(hidden_dim=HID, kernel_size=(7, 7), stride=(3, 3),
                   padding=(3, 3))
    enc_feat = jnp.asarray(rs.rand(T, h4, w4, C), jnp.float32)
    v_ss = ss.init(jax.random.PRNGKey(0), enc_feat, 1, (h4, w4),
                   train=False)

    @jax.jit
    def run_ss(v, x):
        return ss.apply(v, x, 1, (h4, w4), train=False)
    timeit("soft split (19 fr)", lambda x: run_ss(v_ss, x),
           enc_feat.astype(jnp.bfloat16))

    fh = (h4 + 2 * 3 - 7) // 3 + 1
    fw = (w4 + 2 * 3 - 7) // 3 + 1
    sc = SoftComp(channels=C, kernel_size=(7, 7), stride=(3, 3),
                  padding=(3, 3))
    tok = jnp.asarray(rs.rand(1, T, fh, fw, HID), jnp.float32)
    v_sc = sc.init(jax.random.PRNGKey(0), tok, T, (h4, w4), train=False)

    @jax.jit
    def run_sc(v, x):
        return sc.apply(v, x, T, (h4, w4), train=False)
    timeit("soft comp (19 fr)", lambda x: run_sc(v_sc, x),
           tok.astype(jnp.bfloat16))

    dec_in = jnp.asarray(rs.rand(LT, h4, w4, C), jnp.float32)
    bench_module("decoder (11 fr)",
                 Decoder(mid_channels=64, out_channels=3, activation=act,
                         final_activation=lambda_tanh()), dec_in)


if __name__ == "__main__":
    main()
