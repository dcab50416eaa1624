"""Transformer-window deform A/B: force each deform formulation inside
the full ProPainter 19-frame window to see what the recurrence actually
pays for (STATUS.md attributed 592/737 ms to feat-prop; rfc improved
745->551 ms with the footprint path but the window didn't move)."""

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
    print(f"{label:36s} {best*1e3:9.1f} ms", flush=True)
    return best


def main():
    H, W = 240, 432
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    import pytorchcv_tpu as ptc
    from pytorchcv_tpu.nn import deform as D
    from pytorchcv_tpu.models import propainter_rfc as RFC

    rs = np.random.RandomState(0)
    nfr = 19
    mf = jnp.asarray(rs.rand(1, nfr, H, W, 3), jnp.float32)
    mu = jnp.asarray((rs.rand(1, nfr, H, W, 1) > 0.85).astype(np.float32))
    mi = jnp.asarray((rs.rand(1, nfr, H, W, 1) > 0.85).astype(np.float32))
    cf = jnp.asarray(rs.randn(1, 10, H, W, 4), jnp.float32)

    def force(which):
        def dc(x, offset, mask, kernel, bias=None, stride=1, padding=1,
               deform_groups=1, center=None, residue_bound=None):
            fn = {"general": D._deform_general,
                  "footprint": D._deform_footprint}[which]
            return fn(x, offset, mask, kernel, bias, stride, padding,
                      deform_groups)
        RFC.deform_conv2d = dc

    for which in ("footprint", "general"):
        force(which)
        # fresh model per variant: the jit cache would otherwise reuse
        # the first variant's executable
        pp = ptc.get_model("propainter", in_size=(H, W)).as_bfloat16()
        timeit(f"window 19fr deform={which}",
               lambda a, b, c, d: pp(a, b, c, d, 11), mf, mu, mi, cf)


if __name__ == "__main__":
    main()
