"""int8-storage serving pipeline for the MobileNetV2 inverted-residual
family (reference mobilenetv2.py:16 LinearBottleneck: expand 1x1+ReLU6 ->
dw 3x3+ReLU6 -> project 1x1, residual when shape-preserving).

Round 1 measured the *generic* interception int8 slower than bf16 here
(34.7k vs 38.4k img/s): activations stayed bf16, so quant ops added work
without cutting the HBM traffic that bounds this family. This pipeline
stores activations int8 *between* layers — the 1x1 expand/project convs
run on the int8 MXU with requant fused into their epilogues, and the
depthwise 3x3 (VPU work in any dtype) reads/writes int8, halving the
bytes of the wide expanded tensors (6x channels) that dominate traffic.

ReLU6 epilogues make activation ranges statically bounded; scales still
come from ``calibrate_int8`` (the observed amax of each conv's input,
tighter than the 6.0 bound when activations don't saturate).

Tree layout served (``_is_mobilenet_v2``-shaped): features.init_block
(conv+bn), stages of units {conv1?, conv2 (dw), conv3}, final_block,
1x1-conv classifier head on the pooled feature.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .resnet_int8 import _cell_consts, _quant, _EPS

__all__ = ["prepare_int8_mobilenet", "is_mobilenet_v2_tree",
           "prepare_int8_mobilenet_v1", "is_mobilenet_v1_tree"]


def is_mobilenet_v2_tree(variables) -> bool:
    """True when the params tree matches the LinearBottleneck layout this
    pipeline understands (mobilenetv2/v2b families)."""
    try:
        f = variables["params"]["features"]
        ib = f["init_block"]
        if set(ib) != {"conv", "bn"} or "final_block" not in f:
            return False
        stages = [k for k in f if k.startswith("stage")]
        if not stages:
            return False
        for st in stages:
            for up in f[st].values():
                keys = set(up)
                if not keys <= {"conv1", "conv2", "conv3"}:
                    return False
                if "conv2" not in keys or "conv3" not in keys:
                    return False
                if up["conv2"]["conv"]["kernel"].shape[2] != 1:
                    return False          # conv2 must be depthwise
        out = variables["params"]["output"]
        return "kernel" in out and out["kernel"].ndim == 4
    except (KeyError, TypeError, AttributeError):
        return False


def _conv_i8(xq, wq, stride):
    k = wq.shape[0]
    pad = [(k // 2, k // 2)] * 2 if k > 1 else [(0, 0), (0, 0)]
    groups = xq.shape[-1] // wq.shape[2]
    return jax.lax.conv_general_dilated(
        xq, wq, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32)


def _cell6(xq, s_in, cell, stride=1, relu6=True,
           s_out: Optional[float] = None, dw_bf16: bool = False):
    """int8 conv + folded BN (+ ReLU6) (+ requant to int8).

    ``dw_bf16``: compute a depthwise conv in bf16 (inputs dequantized
    in-register; the int8 kernel values are exact in bf16) while keeping
    int8 storage on both sides — the int8->int32 widening conv is VPU
    work with no MXU win, and bf16 measured faster for it."""
    if dw_bf16 and cell["wq"].shape[2] == 1:
        xb = (xq.astype(jnp.float32) * (s_in / 127.0)).astype(jnp.bfloat16)
        y = jax.lax.conv_general_dilated(
            xb, cell["wq"].astype(jnp.bfloat16), (stride, stride),
            [(cell["wq"].shape[0] // 2,) * 2] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=xq.shape[-1],
            preferred_element_type=jnp.float32)
        y = y * cell["gain"] + cell["bias"]
    else:
        y = _conv_i8(xq, cell["wq"], stride).astype(jnp.float32)
        y = y * (cell["gain"] * (s_in / 127.0)) + cell["bias"]
    if relu6:
        y = jnp.clip(y, 0.0, 6.0)
    if s_out is None:
        return y
    return jnp.clip(jnp.round(y * (127.0 / s_out)),
                    -127, 127).astype(jnp.int8)


def _forward(qtree, x, scales, dw_bf16=False):
    f = qtree["features"]
    sc = scales.__getitem__

    stage_names = sorted(k for k in f if k.startswith("stage"))
    units = []                       # (stage, unit, stride)
    for si, st in enumerate(stage_names):
        unames = sorted(f[st], key=lambda u: int(u.replace("unit", "")))
        for ui, u in enumerate(unames):
            units.append((st, u, 2 if (ui == 0 and si != 0) else 1))

    def first_scale_key(st, u):
        c1 = "conv1" if "conv1" in f[st][u] else "conv2"
        return f"features/{st}/{u}/{c1}/conv"

    # Stem: folded bf16 conv (C_in=3, layout-bound in any dtype) + ReLU6.
    stem = f["init_block"]
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), stem["kf"], (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jnp.clip(y + stem["bias"], 0.0, 6.0)
    s_in = sc(first_scale_key(*units[0][:2]))
    xq = _quant(y, s_in)

    for idx, (st, u, stride) in enumerate(units):
        uq = f[st][u]
        prefix = f"features/{st}/{u}"
        if idx + 1 < len(units):
            s_next = sc(first_scale_key(*units[idx + 1][:2]))
        else:
            s_next = sc("features/final_block/conv")
        s_dw = sc(f"{prefix}/conv2/conv")
        s_pj = sc(f"{prefix}/conv3/conv")
        in_ch = xq.shape[-1]
        out_ch = uq["conv3"]["wq"].shape[-1]
        residual = (stride == 1) and (in_ch == out_ch)

        t = xq
        s_t = s_in
        if "conv1" in uq:
            t = _cell6(t, s_t, uq["conv1"], 1, True, s_dw)
            s_t = s_dw
        t = _cell6(t, s_t, uq["conv2"], stride, True, s_pj,
                   dw_bf16=dw_bf16)
        t = _cell6(t, s_pj, uq["conv3"], 1, relu6=False)    # f32
        if residual:
            t = t + xq.astype(jnp.float32) * (s_in / 127.0)
        xq = _quant(t, s_next)
        s_in = s_next

    y = _cell6(xq, s_in, f["final_block"], 1, relu6=True)   # f32
    feat = jnp.mean(y, axis=(1, 2))
    head = qtree["output"]
    logits = feat @ head["kernel"].astype(jnp.float32)
    if "bias" in head:
        logits = logits + head["bias"].astype(jnp.float32)
    return logits.astype(jnp.bfloat16)


def is_mobilenet_v1_tree(variables) -> bool:
    """True for the depthwise-separable v1 layout (mobilenet/fdmobilenet:
    units of {dw_conv, pw_conv}, Dense head)."""
    try:
        f = variables["params"]["features"]
        ib = f["init_block"]
        if set(ib) != {"conv", "bn"}:
            return False
        stages = [k for k in f if k.startswith("stage")]
        if not stages:
            return False
        for st in stages:
            for up in f[st].values():
                if set(up) != {"dw_conv", "pw_conv"}:
                    return False
                if up["dw_conv"]["conv"]["kernel"].shape[2] != 1:
                    return False
                if "bn" not in up["dw_conv"]:
                    return False          # dws_simplified: no dw BN
        out = variables["params"]["output"]
        return "kernel" in out and out["kernel"].ndim == 2
    except (KeyError, TypeError, AttributeError):
        return False


def _v1_unit_strides(model):
    """Per-unit strides from the module tree (first_stage_stride differs
    between mobilenet and fdmobilenet)."""
    def unwrap(m):
        return getattr(m, "module", m) if type(m).__name__ == "Held" else m
    strides = {}
    for layer in map(unwrap, unwrap(model.module.features).layers):
        if type(layer).__name__ != "Sequential" or not layer.name or \
                not layer.name.startswith("stage"):
            continue
        for u in map(unwrap, layer.layers):
            s = u.stride if isinstance(u.stride, int) else u.stride[0]
            strides[(layer.name, u.name)] = s
    return strides


def _forward_v1(qtree, x, scales, strides):
    """relu everywhere, no residuals: dw int8 -> relu -> pw int8 -> relu."""
    f = qtree["features"]
    sc = scales.__getitem__
    units = []
    for st in sorted(k for k in f if k.startswith("stage")):
        for u in sorted(f[st], key=lambda u: int(u.replace("unit", ""))):
            units.append((st, u))

    stem = f["init_block"]
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), stem["kf"], (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y + stem["bias"], 0.0)
    s_in = sc(f"features/{units[0][0]}/{units[0][1]}/dw_conv/conv")
    xq = _quant(y, s_in)

    def cell_relu(xq, s_in, cell, stride, s_out):
        y = _conv_i8(xq, cell["wq"], stride).astype(jnp.float32)
        y = jnp.maximum(y * (cell["gain"] * (s_in / 127.0)) +
                        cell["bias"], 0.0)
        if s_out is None:
            return y
        return jnp.clip(jnp.round(y * (127.0 / s_out)),
                        -127, 127).astype(jnp.int8)

    for idx, (st, u) in enumerate(units):
        uq = f[st][u]
        s_pw = sc(f"features/{st}/{u}/pw_conv/conv")
        nxt = None
        if idx + 1 < len(units):
            nst, nu = units[idx + 1]
            nxt = sc(f"features/{nst}/{nu}/dw_conv/conv")
        xq = cell_relu(xq, s_in, uq["dw_conv"], strides[(st, u)], s_pw)
        xq = cell_relu(xq, s_pw, uq["pw_conv"], 1, nxt)
        s_in = nxt
    feat = jnp.mean(xq, axis=(1, 2))            # f32 (last cell s_out=None)
    head = qtree["output"]
    logits = feat @ head["kernel"].astype(jnp.float32) + \
        head["bias"].astype(jnp.float32)
    return logits.astype(jnp.bfloat16)


def prepare_int8_mobilenet_v1(model, scales: Dict[str, float]
                              ) -> Tuple[Callable, Dict]:
    """v1 (dw/pw) pipeline: quantize weights once -> (infer_fn, qtree)."""
    params = model.variables["params"]
    stats = model.variables["batch_stats"]
    strides = _v1_unit_strides(model)

    def walk(p, s):
        out = {}
        for k, v in p.items():
            if isinstance(v, dict) and "conv" in v and "bn" in v \
                    and "kernel" in v["conv"]:
                out[k] = _cell_consts(v, s[k])
            elif isinstance(v, dict):
                out[k] = walk(v, s.get(k, {}))
            else:
                out[k] = v
        return out

    qfeat = jax.jit(walk)(params["features"], stats["features"])
    qfeat = dict(qfeat)
    stem_p = params["features"]["init_block"]
    stem_s = stats["features"]["init_block"]
    g0 = stem_p["bn"]["scale"].astype(jnp.float32) * jax.lax.rsqrt(
        stem_s["bn"]["var"].astype(jnp.float32) + _EPS)
    qfeat["init_block"] = dict(qfeat["init_block"])
    qfeat["init_block"]["kf"] = (
        stem_p["conv"]["kernel"].astype(jnp.float32) * g0
    ).astype(jnp.bfloat16)
    head = params["output"]
    qtree = {"features": qfeat,
             "output": {"kernel": head["kernel"].astype(jnp.bfloat16),
                        "bias": head["bias"].astype(jnp.float32)}}

    def infer_fn(qtree, x):
        return _forward_v1(qtree, x, scales, strides)

    return infer_fn, qtree


def prepare_int8_mobilenet(model, scales: Dict[str, float],
                           dw_bf16: bool = False
                           ) -> Tuple[Callable, Dict]:
    """Quantize weights once; returns ``(infer_fn, qtree)``.
    ``dw_bf16``: run depthwise convs in bf16 with int8 storage."""
    params = model.variables["params"]
    stats = model.variables["batch_stats"]

    def walk(p, s):
        out = {}
        for k, v in p.items():
            if isinstance(v, dict) and "conv" in v and "bn" in v \
                    and "kernel" in v["conv"]:
                out[k] = _cell_consts(v, s[k])
            elif isinstance(v, dict):
                out[k] = walk(v, s.get(k, {}))
            else:
                out[k] = v
        return out

    qfeat = jax.jit(walk)(params["features"], stats["features"])
    qfeat = dict(qfeat)
    stem_p = params["features"]["init_block"]
    stem_s = stats["features"]["init_block"]
    g0 = stem_p["bn"]["scale"].astype(jnp.float32) * jax.lax.rsqrt(
        stem_s["bn"]["var"].astype(jnp.float32) + _EPS)
    qfeat["init_block"] = dict(qfeat["init_block"])
    qfeat["init_block"]["kf"] = (
        stem_p["conv"]["kernel"].astype(jnp.float32) * g0
    ).astype(jnp.bfloat16)
    head = params["output"]
    qtree = {"features": qfeat,
             "output": {"kernel": head["kernel"][0, 0].astype(jnp.bfloat16),
                        **({"bias": head["bias"].astype(jnp.float32)}
                           if "bias" in head else {})}}

    def infer_fn(qtree, x):
        return _forward(qtree, x, scales, dw_bf16=dw_bf16)

    return infer_fn, qtree
