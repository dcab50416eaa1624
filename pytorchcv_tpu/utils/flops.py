"""FLOPs / memory-traffic reporting via XLA cost analysis.

The reference has no built-in profiler — just vestigial ``calc_flops``
hooks (reference tutti.py:257-264, centernet.py:176-180) consumed by the
external imgclsmob counter that produced the README "FLOPs/2" column. The
TPU-native equivalent asks the compiler: ``jit(fn).lower().compile()
.cost_analysis()`` returns the exact op-level FLOPs and bytes XLA will
execute, for any model, with no per-block bookkeeping.

``flops2`` halves the compiler count to match the reference's
"FLOPs/2 ~= MACs" convention (reference README.md:166).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax

__all__ = ["cost_analysis", "flops2", "profile_trace"]


def _compiled(model, batch: int):
    x = model.dummy_input(batch)
    args = x if isinstance(x, tuple) else (x,)
    variables = model.variables or model.shape_variables(batch)

    def fn(variables, *a):
        return model.module.apply(variables, *a, train=False)

    return jax.jit(fn).lower(variables, *args).compile()


def cost_analysis(model, batch: int = 1) -> Dict[str, Any]:
    """Compiler-derived costs of the jitted inference program.

    Returns {'flops', 'bytes accessed', 'utilization', ...} as reported by
    XLA for the target backend. Works with shape-only variables (no init
    FLOPs needed).
    """
    compiled = _compiled(model, batch)
    costs = compiled.cost_analysis()
    if isinstance(costs, (list, tuple)):   # older jaxlib returns [dict]
        costs = costs[0]
    return dict(costs)


def flops2(model, batch: int = 1) -> float:
    """FLOPs/2 (~= multiply-accumulates), the reference table convention."""
    return cost_analysis(model, batch).get("flops", float("nan")) / 2.0


def profile_trace(fn, *args, log_dir: str = "/tmp/jax-trace",
                  iters: int = 3):
    """Capture a ``jax.profiler`` device trace of ``fn(*args)``.

    View with tensorboard or xprof. Returns the log directory.
    """
    jitted = jax.jit(fn)
    out = jitted(*args)
    jax.block_until_ready(out)
    with jax.profiler.trace(log_dir):
        for _ in range(iters):
            out = jitted(*args)
        jax.block_until_ready(out)
    return log_dir
