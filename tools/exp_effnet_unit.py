"""EfficientNet MBConv unit-level int8 A/B on real effnet-b0 shapes.

STATUS r2: efficientnet_b0 int8-storage measured SLOWER than bf16
(15.6k vs 20.0k img/s). Theory (see quant/mobilenet_int8.py docstring):
the int8->int32 widening depthwise conv is slow on the VPU, and the
dw_bf16 workaround adds a dequant HBM pass over the widest (expanded)
tensor, erasing the storage win. This measures each candidate unit
formulation in isolation at the two dominant shapes so the pipeline fix
is driven by data.

Variants per unit (in_ch C, expanded E = 6C, out_ch O):
  bf16      expand+swish -> dw+swish -> SE -> project      (baseline)
  i8-dwi8   current pipeline math (dw int8 -> f32 -> swish -> bf16)
  i8-dwbf   current with dw_bf16=True (extra dequant pass)
  i8-early  dw int8 -> swish -> REQUANT in epilogue (int8 write);
            SE pool reads the int8 tensor (dequant folded in the
            reduce); gate+requant one int8->int8 pass
  i8-mixed  dw in bf16 with requant fused in epilogue, no int8 dw
  raw dw conv int8 vs bf16 at the unit shape (lower bound check)

MEASURED (v5e, batch 512, 2026-08-17):
  C=16 E=96 O=24 H=112 k=3 s=2 (stage2 unit1, traffic-dominant):
    bf16 4.175 | i8_dwi8 5.605 | i8_dwbf 6.115 | i8_early 5.418 |
    i8_mixed 5.081 | raw dw: bf16 1.903, int8 0.810
  C=80 E=480 O=112 H=14 k=5 s=1 (deep k5 unit):
    bf16 0.674 | i8_dwi8 0.758 | i8_dwbf 1.090 | i8_early 1.019 |
    i8_mixed 1.369 | raw dw: bf16 0.724, int8 0.247
VERDICT: the raw int8 depthwise conv is 2-3x FASTER than bf16 (the
round-1 "int8 widening dw is slow on the VPU" theory is wrong), but
every int8 unit formulation loses to bf16 at both shapes — the cost is
the f32 quant/requant epilogue chains around swish and the SE gate,
which XLA cannot fuse into single passes the way it fuses the pure
bf16 conv+swish. bf16 therefore stays the measured serve default for
EfficientNet (quant/efficientnet_int8.py kept for weight-storage use).

Usage: python tools/exp_effnet_unit.py [batch]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 20


def timeit(fn, *args):
    @functools.partial(jax.jit, static_argnums=0)
    def run_n(n, *a):
        def body(carry, i):
            def vary(x):
                if x.dtype == jnp.int8:
                    return x ^ (i % 2).astype(jnp.int8)
                return x + (i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype))
            out = fn(*jax.tree_util.tree_map(vary, a))
            return carry + jax.tree_util.tree_leaves(out)[0].astype(
                jnp.float32).sum(), None
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
    return best * 1e3


def _swish(y):
    return y * jax.nn.sigmoid(y)


def _conv(x, w, stride=1, groups=1, out=jnp.float32):
    k = w.shape[0]
    pad = [(k // 2, k // 2)] * 2
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups, preferred_element_type=out)


def make_unit(C, E, O, H, k, stride, batch):
    rs = np.random.RandomState(0)
    x8 = jnp.asarray(rs.randint(-127, 128, (batch, H, H, C)), jnp.int8)
    xb = jnp.asarray(rs.rand(batch, H, H, C), jnp.bfloat16)
    w1b = jnp.asarray(rs.randn(1, 1, C, E) * 0.1, jnp.bfloat16)
    wdb = jnp.asarray(rs.randn(k, k, 1, E) * 0.1, jnp.bfloat16)
    w2b = jnp.asarray(rs.randn(1, 1, E, O) * 0.1, jnp.bfloat16)
    w18 = jnp.asarray(rs.randint(-127, 128, (1, 1, C, E)), jnp.int8)
    wd8 = jnp.asarray(rs.randint(-127, 128, (k, k, 1, E)), jnp.int8)
    w28 = jnp.asarray(rs.randint(-127, 128, (1, 1, E, O)), jnp.int8)
    se1 = jnp.asarray(rs.randn(E, C) * 0.1, jnp.float32)
    se2 = jnp.asarray(rs.randn(C, E) * 0.1, jnp.float32)
    gE = jnp.asarray(rs.rand(E) * 0.01, jnp.float32)
    bE = jnp.asarray(rs.rand(E) * 0.01, jnp.float32)
    gO = jnp.asarray(rs.rand(O) * 0.01, jnp.float32)
    bO = jnp.asarray(rs.rand(O) * 0.01, jnp.float32)

    def se_gate(t):
        p = jnp.mean(t.astype(jnp.float32), axis=(1, 2), keepdims=True)
        h = _swish(jnp.einsum("bijc,cm->bijm", p, se1))
        g = jax.nn.sigmoid(jnp.einsum("bijm,mc->bijc", h, se2))
        return g

    def quant(y):
        return jnp.clip(jnp.round(y * 0.43), -127, 127).astype(jnp.int8)

    def unit_bf16(x, w1, wd, w2):
        t = _swish(_conv(x, w1).astype(jnp.float32) * gE + bE
                   ).astype(jnp.bfloat16)
        t = _swish(_conv(t, wd, stride, E).astype(jnp.float32) * gE + bE
                   ).astype(jnp.bfloat16)
        t = t * se_gate(t).astype(t.dtype)
        y = _conv(t, w2).astype(jnp.float32) * gO + bO
        return y.astype(jnp.bfloat16)

    def unit_i8_mixed(x, w1, wd, w2):
        """expand int8-MXU -> bf16 out; dw in bf16 (XLA fast path) with
        requant fused in its epilogue (int8 write); SE pool from int8;
        gate+requant int8->int8; project int8-MXU. No int8 dw conv and
        no extra dequant pass: 9 E-bytes of traffic."""
        t = _swish(_conv(x, w1, out=jnp.int32).astype(jnp.float32)
                   * gE + bE).astype(jnp.bfloat16)
        d = _conv(t, wd.astype(jnp.bfloat16), stride, E
                  ).astype(jnp.float32) * gE + bE
        dq = quant(_swish(d))                         # int8 write
        g = se_gate(dq.astype(jnp.float32) * 0.02)
        t2 = quant(dq.astype(jnp.float32) * g)        # int8->int8 pass
        y = _conv(t2, w2, out=jnp.int32).astype(jnp.float32) * gO + bO
        return y.astype(jnp.bfloat16)

    def unit_i8(x, w1, wd, w2, dw_bf16=False, early=False):
        t = quant(_swish(_conv(x, w1, out=jnp.int32
                               ).astype(jnp.float32) * gE + bE))
        if dw_bf16:
            td = (t.astype(jnp.float32) * 0.02).astype(jnp.bfloat16)
            d = _conv(td, wd.astype(jnp.bfloat16), stride, E
                      ).astype(jnp.float32) * gE + bE
        else:
            d = _conv(t, wd, stride, E, out=jnp.int32
                      ).astype(jnp.float32) * gE + bE
        if early:
            dq = quant(_swish(d))                     # int8 write
            g = se_gate(dq.astype(jnp.float32) * 0.02)
            t2 = quant(dq.astype(jnp.float32) * g)    # int8->int8 pass
        else:
            tb = _swish(d).astype(jnp.bfloat16)       # bf16 write
            g = se_gate(tb)
            t2 = quant(tb.astype(jnp.float32) * g)
        y = _conv(t2, w2, out=jnp.int32).astype(jnp.float32) * gO + bO
        return y.astype(jnp.bfloat16)

    return dict(
        bf16=lambda: timeit(unit_bf16, xb, w1b, wdb, w2b),
        i8_dwi8=lambda: timeit(
            functools.partial(unit_i8), x8, w18, wd8, w28),
        i8_dwbf=lambda: timeit(
            functools.partial(unit_i8, dw_bf16=True), x8, w18, wd8, w28),
        i8_early=lambda: timeit(
            functools.partial(unit_i8, early=True), x8, w18, wd8, w28),
        i8_mixed=lambda: timeit(unit_i8_mixed, x8, w18, wd8, w28),
        dw_bf16_raw=lambda: timeit(
            lambda t, w: _conv(t, w, stride, E),
            jnp.asarray(rs.rand(batch, H, H, E), jnp.bfloat16), wdb),
        dw_i8_raw=lambda: timeit(
            lambda t, w: _conv(t, w, stride, E, out=jnp.int32),
            jnp.asarray(rs.randint(-127, 128, (batch, H, H, E)),
                        jnp.int8), wd8),
    )


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    # (C, E, O, H, k, stride): b0 stage2 unit1 (heaviest traffic) and
    # stage4 k5 unit (deep, wide-E).
    shapes = [(16, 96, 24, 112, 3, 2),
              (80, 480, 112, 14, 5, 1)]
    for C, E, O, H, k, s in shapes:
        print(f"-- unit C={C} E={E} O={O} H={H} k={k} s={s} "
              f"batch={batch}", flush=True)
        fns = make_unit(C, E, O, H, k, s, batch)
        for name, f in fns.items():
            print(f"   {name:12s} {f():8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
