"""Close the ProPainter transformer-window accounting (VERDICT r4 item 6).

The r4 breakdown (exp_pp_breakdown.py) summed ~385 ms of submodule time
against a ~570 ms window wall — ~185 ms unattributed "glue + tunnel RTT".
Both sides of that comparison were measured dispatch-style (one host
dispatch + one scalar fetch through the axon tunnel per call), which
charges every number ~1 tunnel round-trip and leaves host/device overlap
unknown. This tool re-measures BOTH sides device-only — N calls chained
in one jitted lax.scan with an iteration-dependent input (the bench.py
technique; the tunnel's block_until_ready does not sync, a scalar fetch
does) — so stage-sum and window wall are directly comparable:

  window_dev        device time of the full propainter window forward
  sum(stage_dev)    device time of encoder/feat-prop/soft-split/
                    transformer/soft-comp/decoder at the same shapes
  window_e2e        dispatch-style wall (the old ~570 ms figure)
  rtt               measured per-dispatch tunnel overhead (trivial fetch)

Accounting: window_e2e - window_dev = host glue + tunnel; rtt bounds the
tunnel share; window_dev - sum(stage_dev) = real in-graph glue (mask
interpolation, concats, output compositing).

Usage: python tools/exp_pp_accounting.py [t l_t]   (default 19 11 — the
real streaming shapes, STATUS.md)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

SCAN_N = int(os.environ.get("SCAN_N", "8"))


def device_time(label, apply_fn, variables, args, n=SCAN_N):
    """Device-only seconds/call: n calls chained in one jitted scan,
    first arg perturbed per-iteration so XLA cannot hoist the body."""
    @functools.partial(jax.jit, static_argnums=2)
    def run_n(variables, args, n):
        def body(carry, i):
            eps = (i.astype(jnp.float32) * 1e-8).astype(args[0].dtype)
            out = apply_fn(variables, args[0] + eps, *args[1:])
            s = sum(l.astype(jnp.float32).sum()
                    for l in jax.tree_util.tree_leaves(out))
            return carry + s, None
        carry, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                jnp.arange(n))
        return carry

    float(run_n(variables, args, n))          # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(run_n(variables, args, n))
        best = min(best, (time.time() - t0) / n)
    print(f"{label:30s} {best * 1e3:9.1f} ms (device-only)", flush=True)
    return best


def dispatch_time(label, fn, *args, iters=4):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
        best = min(best, time.time() - t0)
    print(f"{label:30s} {best * 1e3:9.1f} ms (dispatch+fetch)", flush=True)
    return best


def main():
    t = int(sys.argv[1]) if len(sys.argv) > 1 else 19
    l_t = int(sys.argv[2]) if len(sys.argv) > 2 else 11
    H, W = 240, 432
    h, w = H // 4, W // 4
    mh, mw = 20, 36
    C, D = 128, 512

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.models.propainter import (
        Encoder, Decoder, SoftSplit, SoftComp,
        TemporalSparseTransformerBlock)
    from pytorchcv_tpu.models.propainter_ip import BidirectionalPropagation
    from pytorchcv_tpu.nn.activ import lambda_leakyrelu, lambda_tanh

    rs = np.random.RandomState(0)
    rng = jax.random.PRNGKey(0)
    act = lambda_leakyrelu(0.2)

    # 0. tunnel overhead: trivial jitted fetch
    triv = jax.jit(lambda a: a + 1.0)
    small = jnp.zeros((8, 128), jnp.float32)
    rtt = dispatch_time("tunnel rtt (trivial fetch)", triv, small)

    # 1. full window, both measurements
    pp = ptc.get_model("propainter", in_size=(H, W)).as_bfloat16()
    mf = jnp.asarray(rs.rand(1, t, H, W, 3), jnp.bfloat16)
    mu = jnp.asarray((rs.rand(1, t, H, W, 1) > 0.85), jnp.bfloat16)
    mi = jnp.asarray((rs.rand(1, t, H, W, 1) > 0.85), jnp.bfloat16)
    cf = jnp.asarray(rs.randn(1, t - l_t + 2, H, W, 4), jnp.bfloat16)

    w_e2e = dispatch_time("window e2e", lambda a: pp(a, mu, mi, cf, l_t),
                          mf)
    w_dev = device_time(
        "window", lambda v, a: pp.module.apply(v, a, mu, mi, cf, l_t),
        pp.variables, (mf,))

    # 2. submodules, device-only, at the window's own shapes
    def bf16(tree):
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if getattr(a, "dtype", None) == jnp.float32 else a, tree)

    total = 0.0

    enc = Encoder(activation=act)
    enc_in = jnp.asarray(rs.rand(t, H, W, 5), jnp.bfloat16)
    vs = bf16(enc.init(rng, enc_in))
    total += device_time(f"  encoder ({t}f)",
                         lambda v, x: enc.apply(v, x), vs, (enc_in,))

    fp = BidirectionalPropagation(channels=C, learnable=True)
    feat = jnp.asarray(rs.rand(1, l_t, h, w, C), jnp.bfloat16)
    flow = jnp.asarray(rs.randn(1, l_t - 1, h, w, 2), jnp.bfloat16)
    pmask = jnp.asarray(rs.rand(1, l_t, h, w, 2) > 0.5, jnp.bfloat16)
    vs = bf16(fp.init(rng, feat, flow, flow, pmask))
    total += device_time(
        f"  feat_prop ({l_t}f deform)",
        lambda v, a, b, c, d: fp.apply(v, a, b, c, d),
        vs, (feat, flow, flow, pmask))

    ss = SoftSplit(hidden_dim=D)
    sfeat = jnp.asarray(rs.rand(t, h, w, C), jnp.bfloat16)
    vs = bf16(ss.init(rng, sfeat, 1, (h, w)))
    total += device_time("  soft_split",
                         lambda v, x: ss.apply(v, x, 1, (h, w)),
                         vs, (sfeat,))

    tr = TemporalSparseTransformerBlock(dim=D, depth=8)
    tok = jnp.asarray(rs.rand(1, t, mh, mw, D), jnp.bfloat16)
    l_mask = jnp.asarray(rs.rand(1, l_t, mh, mw, 1) > 0.5, jnp.bfloat16)
    vs = bf16(tr.init(rng, tok, (h, w), l_mask))
    total += device_time("  transformer blocks (8)",
                         lambda v, x, m: tr.apply(v, x, (h, w), m),
                         vs, (tok, l_mask))

    sc = SoftComp(channels=C)
    vs = bf16(sc.init(rng, tok, t, (h, w)))
    total += device_time("  soft_comp",
                         lambda v, x: sc.apply(v, x, t, (h, w)),
                         vs, (tok,))

    dec = Decoder(mid_channels=64, out_channels=3, activation=act,
                  final_activation=lambda_tanh())
    dfeat = jnp.asarray(rs.rand(l_t, h, w, C), jnp.bfloat16)
    vs = bf16(dec.init(rng, dfeat))
    total += device_time(f"  decoder ({l_t}f)",
                         lambda v, x: dec.apply(v, x), vs, (dfeat,))

    print(f"\n{'sum(stages, device)':30s} {total * 1e3:9.1f} ms")
    print(f"{'window device':30s} {w_dev * 1e3:9.1f} ms   "
          f"coverage {total / w_dev * 100:.1f}%")
    print(f"{'in-graph glue':30s} {(w_dev - total) * 1e3:9.1f} ms")
    print(f"{'dispatch overhead (e2e-dev)':30s} "
          f"{(w_e2e - w_dev) * 1e3:9.1f} ms   vs rtt {rtt * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
