"""int8-storage serving for DarkNet-53.

DarkNet-53 (reference darknet53.py:15-145: leaky-ReLU conv stacks —
init 3x3, per-stage 3x3/s2 downsample, then 1x1-half -> 3x3-double
residual units) is compute-dominated (~14 GOP/image) with plain dense
convs, so it takes the int8 MXU well: even the *generic* interception
quantizer (bf16 activations, weights requantized in-graph every step)
measured 11.6k img/s vs 9.1k bf16 on v5e batch 256
(tools/exp_generic_families.py). This pipeline stores activations int8
between layers and quantizes weights once, following
quant/resnet_int8.py conventions:

- init_block (C_in=3, MXU-layout-bound) runs in folded bf16;
- downsample convs and unit conv1: int8 conv -> folded-BN dequant ->
  leaky ReLU -> requant, writing int8;
- unit conv2: int8 conv -> leaky ReLU in f32, residual added in the
  bf16 domain (the identity is a dequant of the unit's int8 input —
  same policy as resnet_int8, where int8-domain adds measured slower),
  then requant to the next conv's calibrated scale;
- head: f32 global-avg-pool + dense (negligible).

The leaky slope is fixed at 0.1 — the only value the reference's
get_darknet53 ever constructs (darknet53.py:52,145).

MEASURED (v5e, 2026-08-17): 13,587 img/s at batch 384 (13,178 at 256)
vs 11.6k generic int8 / 9.1k bf16 — 1.50x over bf16; routed in serve
auto mode.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from .resnet_int8 import _cell_consts, _conv_i8, _quant

__all__ = ["prepare_int8_darknet", "is_darknet53_tree"]

_ALPHA = 0.1


def is_darknet53_tree(variables) -> bool:
    """True for the zoo DarkNet-53 params layout this pipeline serves."""
    try:
        p = variables["params"]
        f = p["features"]
        ib = f["init_block"]
        if set(ib) != {"conv", "bn"} or ib["conv"]["kernel"].ndim != 4:
            return False
        stages = sorted(k for k in f if k.startswith("stage"))
        if not stages or set(f) != set(stages) | {"init_block"}:
            return False
        for st in stages:
            units = f[st]
            if set(units.get("unit1", {})) != {"conv", "bn"}:
                return False                   # downsample conv first
            for u, up in units.items():
                if u == "unit1":
                    continue
                if set(up) != {"conv1", "conv2"}:
                    return False
                if up["conv1"]["conv"]["kernel"].shape[:2] != (1, 1):
                    return False
                if up["conv2"]["conv"]["kernel"].shape[:2] != (3, 3):
                    return False
        out = p["output"]
        return "kernel" in out and out["kernel"].ndim == 2
    except (KeyError, TypeError, AttributeError):
        return False


def _leaky(y):
    return jnp.maximum(y, 0.0) + _ALPHA * jnp.minimum(y, 0.0)


def _cell_lk(xq, s_in, cell, stride=1, s_out=None):
    """int8 conv + folded BN + leaky ReLU (resnet_int8._cell with the
    DarkNet activation)."""
    y = _conv_i8(xq, cell["wq"], stride).astype(jnp.float32)
    y = _leaky(y * (cell["gain"] * (s_in / 127.0)) + cell["bias"])
    if s_out is None:
        return y
    return _quant(y, s_out)


def _forward(qtree, x, scales):
    f = qtree["features"]
    stages = sorted(f, key=lambda s: int(s.replace("stage", ""))
                    if s.startswith("stage") else -1)
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), qtree["kf0"], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = _leaky(y + f["init_block"]["bias"])

    # Walk (stage, unit) order, carrying the int8 tensor + its scale.
    order = []
    for st in stages:
        if st == "init_block":
            continue
        for u in sorted(f[st], key=lambda u: int(u.replace("unit", ""))):
            order.append((st, u))

    def s_of(st, u):
        leaf = "conv" if "wq" in f[st][u] else "conv1"
        suffix = "/conv" if leaf == "conv1" else ""
        return scales[f"features/{st}/{u}/{leaf}{suffix}"]

    xq = _quant(y, s_of(*order[0]))
    s_in = s_of(*order[0])
    for i, (st, u) in enumerate(order):
        nxt = order[i + 1] if i + 1 < len(order) else None
        s_next = s_of(*nxt) if nxt else None
        unit = f[st][u]
        if "wq" in unit:                       # downsample 3x3/s2 conv
            res = _cell_lk(xq, s_in, unit, 2, s_next)
            if s_next is None:
                out = res                      # f32 (stage ends the net)
            else:
                xq, s_in = res, s_next
        else:                                  # residual DarkUnit
            s_mid = scales[f"features/{st}/{u}/conv2/conv"]
            t = _cell_lk(xq, s_in, unit["conv1"], 1, s_mid)
            t = _cell_lk(t, s_mid, unit["conv2"], 1)
            y = t + xq.astype(jnp.float32) * (s_in / 127.0)
            if s_next is None:
                out = y
            else:
                xq = _quant(y, s_next)
                s_in = s_next
    feat = jnp.mean(out, axis=(1, 2))
    head = qtree["output"]
    logits = feat @ head["kernel"].astype(jnp.float32) + \
        head["bias"].astype(jnp.float32)
    return logits.astype(jnp.bfloat16)


def prepare_int8_darknet(model, scales: Dict[str, float]
                         ) -> Tuple[Callable, Dict]:
    """Serving entry point: quantize weights ONCE, return
    ``(infer_fn, qtree)`` with ``infer_fn(qtree, x) -> logits``."""
    params = model.variables["params"]
    stats = model.variables["batch_stats"]
    pf, sf = params["features"], stats["features"]

    qfeat = {}
    ib = _cell_consts(pf["init_block"], sf["init_block"])
    qfeat["init_block"] = ib
    for st in pf:
        if not st.startswith("stage"):
            continue
        qfeat[st] = {}
        for u, up in pf[st].items():
            if "conv" in up:
                qfeat[st][u] = _cell_consts(up, sf[st][u])
            else:
                qfeat[st][u] = {
                    "conv1": _cell_consts(up["conv1"], sf[st][u]["conv1"]),
                    "conv2": _cell_consts(up["conv2"], sf[st][u]["conv2"]),
                }
    # Folded bf16 init kernel; its dequant bias stays in the cell consts.
    g0 = params["features"]["init_block"]["bn"]["scale"].astype(jnp.float32) \
        * jax.lax.rsqrt(
            stats["features"]["init_block"]["bn"]["var"].astype(jnp.float32)
            + 1e-5)
    kf0 = (pf["init_block"]["conv"]["kernel"].astype(jnp.float32) * g0
           ).astype(jnp.bfloat16)
    qtree = {"features": qfeat, "kf0": kf0,
             "output": {"kernel": params["output"]["kernel"]
                        .astype(jnp.bfloat16),
                        "bias": params["output"]["bias"]
                        .astype(jnp.float32)}}

    def infer_fn(qtree, x):
        return _forward(qtree, x, scales)

    return infer_fn, qtree
