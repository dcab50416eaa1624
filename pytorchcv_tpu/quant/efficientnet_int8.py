"""int8-storage serving for EfficientNet (non-tf variants).

MBConv (reference efficientnet.py:118: expand 1x1 + swish -> dw k x k +
swish -> SE -> project 1x1, residual when shape-preserving) with
activations stored int8 between layers, like ``mobilenet_int8`` for the
ReLU6 family. Swish epilogues and the SE gate (swish mid-activation) run
in f32 on conv outputs before requantization; per-unit static config
(stride, kernel size, SE presence) is read from the *module* tree, which
carries the ctor arguments the params tree cannot express.

tf-mode variants (efficientnet_b0b/...) use dynamic SAME padding
(efficientnet.py:30) and are not served by this pipeline — the serve
dispatcher falls back to bf16 for them.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from .resnet_int8 import _cell_consts, _quant, _EPS

__all__ = ["prepare_int8_efficientnet", "is_efficientnet_module"]


def _swish(y):
    return y * jax.nn.sigmoid(y)


def _unwrap(m):
    """Containers store children as ``Held`` (nn/base.py:73) to control
    adoption; unwrap for structural inspection."""
    return getattr(m, "module", m) if type(m).__name__ == "Held" else m


def is_efficientnet_module(model) -> bool:
    """True for non-tf EfficientNet Model handles this pipeline serves."""
    try:
        feats = _unwrap(model.module.features)
        units = []
        for layer in map(_unwrap, feats.layers):
            lname = type(layer).__name__
            if lname == "EffiInitBlock":
                if layer.tf_mode:
                    return False
            if lname == "Sequential":
                for u in map(_unwrap, layer.layers):
                    un = type(u).__name__
                    if un not in ("EffiDwsConvUnit", "EffiInvResUnit"):
                        return False
                    if u.tf_mode:
                        return False
                    units.append(u)
        return bool(units) and type(_unwrap(
            model.module.output)).__name__ == "EffiOutput"
    except AttributeError:
        return False


def _unit_plan(model):
    """[(stage_name, unit_name, kind, stride, ksize)] from the module."""
    plan = []
    for layer in map(_unwrap, _unwrap(model.module.features).layers):
        if type(layer).__name__ != "Sequential" or not layer.name or \
                not layer.name.startswith("stage"):
            continue
        for u in map(_unwrap, layer.layers):
            kind = ("dws" if type(u).__name__ == "EffiDwsConvUnit"
                    else "inv")
            ks = getattr(u, "kernel_size", 3)
            stride = u.stride if isinstance(u.stride, int) else u.stride[0]
            plan.append((layer.name, u.name, kind, stride, ks))
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


def _se_gate_swish(t, se):
    """SE with swish mid-activation (efficientnet SE: reduction pools,
    conv1 + swish, conv2 + sigmoid, scale); pooled math in f32, the
    big-tensor scale in t's own dtype."""
    p = jnp.mean(t.astype(jnp.float32), axis=(1, 2), keepdims=True)
    k1 = se["conv1"]["kernel"][0, 0].astype(jnp.float32)
    h = _swish(jnp.einsum("bijc,cm->bijm", p, k1) +
               se["conv1"]["bias"].astype(jnp.float32))
    k2 = se["conv2"]["kernel"][0, 0].astype(jnp.float32)
    g = jax.nn.sigmoid(jnp.einsum("bijm,mc->bijc", h, k2) +
                       se["conv2"]["bias"].astype(jnp.float32))
    return t * g.astype(t.dtype)


def _forward(qtree, x, scales, plan, dw_bf16=False):
    f = qtree["features"]
    sc = scales.__getitem__

    def first_key(st, u, kind):
        c1 = "dw_conv" if kind == "dws" else "conv1"
        return f"features/{st}/{u}/{c1}/conv"

    stem = f["init_block"]["conv"]
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), stem["kf"], (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = _swish(y + stem["bias"])
    s_in = sc(first_key(*plan[0][:3]))
    xq = _quant(y, s_in)

    for idx, (st, u, kind, stride, ks) in enumerate(plan):
        uq = f[st][u]
        prefix = f"features/{st}/{u}"
        if idx + 1 < len(plan):
            s_next = sc(first_key(*plan[idx + 1][:3]))
        else:
            s_next = sc("features/final_block/conv")
        if kind == "dws":
            dw_name, pw_name = "dw_conv", "pw_conv"
            t, s_t = xq, s_in
        else:
            dw_name, pw_name = "conv2", "conv3"
            s_dw = sc(f"{prefix}/conv2/conv")
            t = _quant(_swish(_cell_f32(xq, s_in, uq["conv1"], 1)), s_dw)
            s_t = s_dw
        s_pj = sc(f"{prefix}/{pw_name}/conv")
        # The expanded dw output is the widest tensor in the block; with
        # an SE gate it must materialize for the pooled statistics — keep
        # it bf16 (not f32) so that pass costs half the bytes.
        t = _swish(_cell_f32(t, s_t, uq[dw_name], stride,
                             dw_bf16=dw_bf16)).astype(jnp.bfloat16)
        if "se" in uq:
            t = _se_gate_swish(t, uq["se"])
        t = _cell_f32(_quant(t, s_pj), s_pj, uq[pw_name], 1)
        in_ch = xq.shape[-1]
        out_ch = t.shape[-1]
        if stride == 1 and in_ch == out_ch:
            t = t + xq.astype(jnp.float32) * (s_in / 127.0)
        xq = _quant(t, s_next)
        s_in = s_next

    y = _swish(_cell_f32(xq, s_in, f["final_block"], 1))
    feat = jnp.mean(y, axis=(1, 2))
    head = qtree["output"]
    logits = feat @ head["kernel"].astype(jnp.float32) + \
        head["bias"].astype(jnp.float32)
    return logits.astype(jnp.bfloat16)


def prepare_int8_efficientnet(model, scales: Dict[str, float],
                              dw_bf16: bool = False
                              ) -> Tuple[Callable, Dict]:
    """Quantize weights once; returns ``(infer_fn, qtree)``.
    ``dw_bf16``: run depthwise convs in bf16 with int8 storage (measured
    slightly slower than int8 dw on v5e; kept as a knob)."""
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
    stem_p = params["features"]["init_block"]["conv"]
    stem_s = stats["features"]["init_block"]["conv"]
    g0 = stem_p["bn"]["scale"].astype(jnp.float32) * jax.lax.rsqrt(
        stem_s["bn"]["var"].astype(jnp.float32) + _EPS)
    qfeat["init_block"] = dict(qfeat["init_block"])
    qfeat["init_block"]["conv"] = dict(qfeat["init_block"]["conv"])
    qfeat["init_block"]["conv"]["kf"] = (
        stem_p["conv"]["kernel"].astype(jnp.float32) * g0
    ).astype(jnp.bfloat16)
    head = params["output"]["fc"]
    qtree = {"features": qfeat,
             "output": {"kernel": head["kernel"].astype(jnp.bfloat16),
                        "bias": head["bias"].astype(jnp.float32)}}

    def infer_fn(qtree, x):
        return _forward(qtree, x, scales, plan, dw_bf16=dw_bf16)

    return infer_fn, qtree
