"""int8-storage serving for MobileNetV3 (reference mobilenetv3.py:17:
exp 1x1 -> dw 3/5 -> [SE hsigmoid] -> project 1x1, per-unit relu/hswish).

Same scheme as ``mobilenet_int8`` (activations stored int8 between
layers, 1x1 convs on the int8 MXU with fused requant epilogues); per-unit
static config (stride, kernel, activation fn, SE) comes from the module
tree — the activation factories (nn/activ.py:103) resolve to plain jnp
functions via ``factory(name=None)``.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from .resnet_int8 import _cell_consts, _quant, _EPS

__all__ = ["prepare_int8_mobilenetv3", "is_mobilenetv3_module"]


def _unwrap(m):
    return getattr(m, "module", m) if type(m).__name__ == "Held" else m


def is_mobilenetv3_module(model) -> bool:
    try:
        feats = _unwrap(model.module.features)
        n_units = 0
        for layer in map(_unwrap, feats.layers):
            if type(layer).__name__ == "Sequential" and layer.name and \
                    layer.name.startswith("stage"):
                for u in map(_unwrap, layer.layers):
                    if type(u).__name__ != "MobileNetV3Unit":
                        return False
                    n_units += 1
        return n_units > 0 and type(_unwrap(
            model.module.output)).__name__ == "MobileNetV3Classifier"
    except AttributeError:
        return False


def _unit_plan(model):
    """[(stage, unit, stride, act_fn, use_se)] from the module tree."""
    plan = []
    for layer in map(_unwrap, _unwrap(model.module.features).layers):
        if type(layer).__name__ != "Sequential" or not layer.name or \
                not layer.name.startswith("stage"):
            continue
        for u in map(_unwrap, layer.layers):
            stride = u.stride if isinstance(u.stride, int) else u.stride[0]
            plan.append((layer.name, u.name, stride,
                         u.activation(name=None), bool(u.use_se)))
    return plan


def _conv_i8(xq, wq, stride):
    k = wq.shape[0]
    pad = [(k // 2, k // 2)] * 2 if k > 1 else [(0, 0), (0, 0)]
    groups = xq.shape[-1] // wq.shape[2]
    return jax.lax.conv_general_dilated(
        xq, wq, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32)


def _cell_f32(xq, s_in, cell, stride=1, dw_bf16=False):
    if dw_bf16 and cell["wq"].shape[2] == 1:
        k = cell["wq"].shape[0]
        xb = (xq.astype(jnp.float32) * (s_in / 127.0)).astype(jnp.bfloat16)
        y = jax.lax.conv_general_dilated(
            xb, cell["wq"].astype(jnp.bfloat16), (stride, stride),
            [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=xq.shape[-1],
            preferred_element_type=jnp.float32)
        return y * cell["gain"] + cell["bias"]
    y = _conv_i8(xq, cell["wq"], stride).astype(jnp.float32)
    return y * (cell["gain"] * (s_in / 127.0)) + cell["bias"]


def _hsig(y):
    return jax.nn.relu6(y + 3.0) / 6.0


def _se_gate_hsig(t, se):
    """SE with relu mid + hard-sigmoid out (mobilenetv3 SE)."""
    p = jnp.mean(t, axis=(1, 2), keepdims=True)
    k1 = se["conv1"]["kernel"][0, 0].astype(jnp.float32)
    h = jnp.maximum(jnp.einsum("bijc,cm->bijm", p, k1) +
                    se["conv1"]["bias"].astype(jnp.float32), 0.0)
    k2 = se["conv2"]["kernel"][0, 0].astype(jnp.float32)
    g = _hsig(jnp.einsum("bijm,mc->bijc", h, k2) +
              se["conv2"]["bias"].astype(jnp.float32))
    return t * g


def _forward(qtree, x, scales, plan, dw_bf16=False):
    f = qtree["features"]
    sc = scales.__getitem__
    hswish = lambda y: y * jax.nn.relu6(y + 3.0) / 6.0

    def first_key(st, u):
        c1 = "exp_conv" if "exp_conv" in f[st][u] else "conv1"
        return f"features/{st}/{u}/{c1}/conv"

    stem = f["init_block"]
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), stem["kf"], (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = hswish(y + stem["bias"])
    s_in = sc(first_key(*plan[0][:2]))
    xq = _quant(y, s_in)

    for idx, (st, u, stride, act, use_se) in enumerate(plan):
        uq = f[st][u]
        prefix = f"features/{st}/{u}"
        if idx + 1 < len(plan):
            s_next = sc(first_key(*plan[idx + 1][:2]))
        else:
            s_next = sc("features/final_block/conv/conv")
        s_dw = sc(f"{prefix}/conv1/conv")
        s_pj = sc(f"{prefix}/conv2/conv")
        t, s_t = xq, s_in
        if "exp_conv" in uq:
            t = _quant(act(_cell_f32(t, s_t, uq["exp_conv"], 1)), s_dw)
            s_t = s_dw
        t = act(_cell_f32(t, s_t, uq["conv1"], stride, dw_bf16=dw_bf16))
        if use_se:
            t = _se_gate_hsig(t, uq["se"])
        t = _cell_f32(_quant(t, s_pj), s_pj, uq["conv2"], 1)
        if stride == 1 and xq.shape[-1] == t.shape[-1]:
            t = t + xq.astype(jnp.float32) * (s_in / 127.0)
        xq = _quant(t, s_next)
        s_in = s_next

    fb = f["final_block"]
    y = hswish(_cell_f32(xq, s_in, fb["conv"], 1))
    if "se" in fb:
        y = _se_gate_hsig(y, fb["se"])
    feat = jnp.mean(y, axis=(1, 2), keepdims=True)
    head = qtree["output"]
    h = jnp.einsum("bijc,cm->bijm", feat,
                   head["conv1"]["kernel"][0, 0].astype(jnp.float32))
    if "bias" in head["conv1"]:
        h = h + head["conv1"]["bias"].astype(jnp.float32)
    h = hswish(h)
    logits = jnp.einsum("bijm,mc->bijc", h,
                        head["conv2"]["kernel"][0, 0].astype(jnp.float32))
    logits = logits + head["conv2"]["bias"].astype(jnp.float32)
    return logits[:, 0, 0, :].astype(jnp.bfloat16)


def prepare_int8_mobilenetv3(model, scales: Dict[str, float],
                             dw_bf16: bool = False
                             ) -> Tuple[Callable, Dict]:
    """Quantize weights once; returns ``(infer_fn, qtree)``."""
    params = model.variables["params"]
    stats = model.variables["batch_stats"]
    plan = _unit_plan(model)

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
    qtree = {"features": qfeat, "output": params["output"]}

    def infer_fn(qtree, x):
        return _forward(qtree, x, scales, plan, dw_bf16=dw_bf16)

    return infer_fn, qtree
