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
import math
from typing import Any, Dict, Optional

import jax

__all__ = ["cost_analysis", "flops2", "analytic_flops", "analytic_flops2",
           "profile_trace"]


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


# ---------------------------------------------------------------------------
# Analytic (pre-fusion) counter — the reference table convention.
#
# The published "FLOPs/2" column was produced by the imgclsmob hook counter
# walking the torch module tree BEFORE any operator fusion (the vestigial
# per-module hooks survive as reference tutti.py:257-264, centernet.py:176-180:
# each returns (num_flops, num_macs) and the table value is total_flops/2).
# XLA's cost_analysis() reports the POST-fusion program, so it systematically
# undercounts elementwise work that fuses into convolutions (median -4% on
# this zoo). The TPU-native equivalent of the hook walker is a jaxpr
# traversal: trace the inference function abstractly (no compilation — a
# resnet1202 traces in seconds where its CPU compile takes >30 min) and count
# each primitive analytically.
# ---------------------------------------------------------------------------

# primitives counted as 1 flop per output element
_ELEMENTWISE = {
    "add", "sub", "mul", "div", "max", "min", "rem", "pow", "atan2",
    "exp", "exp2", "log", "log1p", "expm1", "tanh", "logistic", "erf",
    "erfc", "erf_inv", "rsqrt", "sqrt", "cbrt", "sin", "cos", "tan",
    "asin", "acos", "atan", "sinh", "cosh", "abs", "neg", "sign",
    "floor", "ceil", "round", "integer_pow", "square", "reciprocal",
    "is_finite", "nextafter", "logistic", "clamp",
    "lt", "gt", "ge", "le", "eq", "ne", "and", "or", "xor", "not",
    "select_n",
}

# pure data movement / bookkeeping: 0 flops
_ZERO = {
    "reshape", "broadcast_in_dim", "transpose", "convert_element_type",
    "slice", "dynamic_slice", "dynamic_update_slice", "concatenate",
    "pad", "rev", "gather", "scatter", "scatter-add", "squeeze",
    "iota", "copy", "stop_gradient", "device_put", "split",
    "bitcast_convert_type", "expand_dims", "argmax", "argmin",
    "reduce_precision", "rng_bit_generator", "random_seed",
    "random_wrap", "random_bits", "random_fold_in", "shift_left",
    "shift_right_logical", "shift_right_arithmetic", "population_count",
    "clz", "sort", "top_k", "create_token", "empty", "real", "imag",
}


# non-unit per-element costs. sigmoid=4 is the imgclsmob convention
# (exp+add+div+neg), fitted against the published efficientnet_b0 row:
# the residual is -2.35% at cost 1 and -0.12% at cost 4 over its 6.17M
# logistic elements.
_EW_COST = {"logistic": 4}


def _numel(shape) -> int:
    return int(math.prod(shape)) if shape else 1


def _count_eqn(eqn, counts, mult):
    """Add eqn's analytic flops/macs into ``counts`` (x ``mult``)."""
    prim = eqn.primitive.name
    out_aval = eqn.outvars[0].aval if eqn.outvars else None
    out_n = _numel(out_aval.shape) if out_aval is not None else 0

    if prim == "conv_general_dilated":
        # MACs = out positions x (kernel_spatial x in_ch / groups).
        # Kernel shape already encodes in_ch/groups in its input-feature dim.
        # Transposed convs lower to lhs_dilation>1: (d-1)/d of the dilated
        # input taps are structural zeros, so the honest MAC count divides
        # by prod(lhs_dilation) (equivalently: input-centric
        # in_pos x k x Cout/groups).
        rhs = eqn.invars[1].aval.shape
        dn = eqn.params["dimension_numbers"]
        rhs_spec = dn.rhs_spec  # (out_ch_dim, in_ch_dim, *spatial)
        k_in = rhs[rhs_spec[1]]
        k_spatial = _numel([rhs[d] for d in rhs_spec[2:]])
        lhs_dil = _numel(eqn.params.get("lhs_dilation") or (1,))
        macs = out_n * k_spatial * k_in // lhs_dil
        counts["macs"] += mult * macs
        counts["flops"] += mult * 2 * macs
    elif prim == "dot_general":
        (lc, _rc), (lb, _rb) = eqn.params["dimension_numbers"]
        lhs = eqn.invars[0].aval.shape
        contract = _numel([lhs[d] for d in lc])
        macs = out_n * contract
        counts["macs"] += mult * macs
        counts["flops"] += mult * 2 * macs
    elif prim in ("reduce_window_max", "reduce_window_min"):
        counts["flops"] += mult * out_n * _numel(eqn.params["window_dimensions"])
    elif prim == "reduce_window_sum":
        counts["flops"] += mult * out_n * _numel(eqn.params["window_dimensions"])
    elif prim.startswith("reduce_") or prim == "reduce":
        counts["flops"] += mult * _numel(eqn.invars[0].aval.shape)
    elif prim == "cumsum" or prim.startswith("cum"):
        counts["flops"] += mult * _numel(eqn.invars[0].aval.shape)
    elif prim in _ELEMENTWISE:
        counts["flops"] += mult * _EW_COST.get(prim, 1) * out_n
    elif prim in _ZERO:
        pass
    elif prim == "scan":
        body = eqn.params["jaxpr"].jaxpr
        _walk(body, counts, mult * int(eqn.params["length"]))
    elif prim in ("while", "cond"):
        # inference zoo: no data-dependent while loops; cond branches are
        # structurally identical here -> count the first branch once
        key = "branches" if prim == "cond" else "body_jaxpr"
        branches = eqn.params.get(key)
        if prim == "cond":
            _walk(branches[0].jaxpr, counts, mult)
        else:
            _walk(eqn.params["body_jaxpr"].jaxpr, counts, mult)
            counts["unknown"].add("while(trip-count=1 assumed)")
    elif prim in ("custom_jvp_call", "custom_vjp_call",
                  "custom_vjp_call_jaxpr"):
        sub = eqn.params.get("call_jaxpr") or eqn.params.get("fun_jaxpr")
        if sub is not None:
            _walk(sub.jaxpr if hasattr(sub, "jaxpr") else sub, counts, mult)
    elif prim in ("jit", "pjit", "closed_call", "core_call", "remat",
                  "checkpoint", "custom_lin", "xla_call", "named_call"):
        sub = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
        if sub is not None:
            _walk(sub.jaxpr if hasattr(sub, "jaxpr") else sub, counts, mult)
    else:
        # unrecognised primitive: record it (visible in the breakdown) and
        # charge 1 flop/element as the conservative default
        counts["unknown"].add(prim)
        counts["flops"] += mult * out_n


def _walk(jaxpr, counts, mult=1):
    for eqn in jaxpr.eqns:
        _count_eqn(eqn, counts, mult)


def analytic_flops(model, batch: int = 1) -> Dict[str, Any]:
    """Pre-fusion analytic op counts of the inference program.

    Traces abstractly (``jax.make_jaxpr`` — no XLA compile) and returns
    {'flops', 'macs', 'unknown'}: total flops (2 per MAC + 1 per
    elementwise output element, the imgclsmob hook convention behind the
    reference README's FLOPs/2 column), the MAC subtotal, and any
    primitives the counter had to guess at.
    """
    x = model.dummy_input(batch)
    args = x if isinstance(x, tuple) else (x,)
    variables = model.variables or model.shape_variables(batch)

    def fn(variables, *a):
        return model.module.apply(variables, *a, train=False)

    jaxpr = jax.make_jaxpr(fn)(variables, *args)
    counts = {"flops": 0, "macs": 0, "unknown": set()}
    _walk(jaxpr.jaxpr, counts)
    counts["unknown"] = sorted(counts["unknown"])
    return counts


def analytic_flops2(model, batch: int = 1) -> float:
    """Analytic FLOPs/2 — the reference table convention (README.md:166)."""
    return analytic_flops(model, batch)["flops"] / 2.0


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
