"""int8-storage serving for the VGG family (all 12 registered variants).

VGG (reference vgg.py:79-147: bias-ful 3x3 conv stacks, 2x2/s2 maxpool
after each stage, 4096-wide fc1/fc2 + fc3 head) is the zoo's most
compute-dominated classic — vgg16 runs ~31 GOP/image, so on v5e the
int8 MXU (~386 TOP/s vs ~197 bf16 TFLOP/s) is a near-2x lever and the
138M-param fc head shrinks from 276 MB bf16 to 138 MB of weight traffic
per step.

Dataflow (mirrors quant/resnet_int8.py conventions):
- conv1_1 (C_in=3, layout-bound on the MXU) runs in folded bf16 like
  the ResNet stem — measured fastest there for the same reason;
- every other conv: int8 x int8 -> int32 MXU conv, epilogue dequant
  (BN affine folded for bn_vgg* variants, conv bias folded in either
  way) + ReLU + requant to the next conv's calibrated input scale,
  writing int8 — activations are stored int8 end to end;
- 2x2 maxpools run on the int8 tensor (quantization is monotone, so
  quant-then-pool == pool-then-quant bit-exactly);
- the head flattens in NCHW element order (models/shell.py
  ``_flatten_torch_order``) and runs fc1/fc2/fc3 as int8 matmuls with
  per-output-channel weight scales; fc activation scales come from the
  Dense entries ``calibrate_int8`` records (``output/fc1/fc`` ...).

All three parameterizations are handled: plain (bias, no bn), bn_vgg
(bn, no bias), bn_vggb (bias + bn): y = g*conv + (beta + g*(bias-mean))
with g = gamma*rsqrt(var+eps) folds every case into the shared
{wq, gain, bias} cell-const form of ``resnet_int8._cell``.

MEASURED (v5e, tools/exp_vgg.py, 2026-08-17): vgg16 int8 8,349 img/s
vs bf16 5,063 at batch 256 (8,107 vs 4,661 at 128) — 1.65x; routed in
serve auto mode.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from .resnet_int8 import _EPS, _cell, _quant

__all__ = ["prepare_int8_vgg", "is_plain_vgg"]


def is_plain_vgg(variables) -> bool:
    """True when the params tree matches the zoo VGG layout this
    pipeline serves: features = stages of 3x3 ConvBlock units (optional
    bn), output = fc1/fc2 (VGGDense wrapping 'fc') + fc3."""
    try:
        p = variables["params"]
        f = p["features"]
        stages = sorted(k for k in f if k.startswith("stage"))
        if not stages or set(f) != set(stages):
            return False
        for st in stages:
            units = f[st]
            if not units or any(not u.startswith("unit") for u in units):
                return False
            for up in units.values():
                if set(up) - {"conv", "bn"} or "conv" not in up:
                    return False
                k = up["conv"]["kernel"]
                if k.ndim != 4 or k.shape[:2] != (3, 3):
                    return False
        out = p["output"]
        if set(out) != {"fc1", "fc2", "fc3"}:
            return False
        for fk in ("fc1", "fc2"):
            if "kernel" not in out[fk].get("fc", {}):
                return False
        return "kernel" in out["fc3"]
    except (KeyError, TypeError, AttributeError):
        return False


def _conv_consts(unit_p, unit_s):
    """Fold conv kernel (+bias) (+BN) into {wq int8, gain, bias}."""
    kernel = unit_p["conv"]["kernel"].astype(jnp.float32)
    cbias = unit_p["conv"].get("bias")
    cbias = (cbias.astype(jnp.float32) if cbias is not None
             else jnp.zeros((kernel.shape[-1],), jnp.float32))
    if "bn" in unit_p:
        gamma = unit_p["bn"]["scale"].astype(jnp.float32)
        beta = unit_p["bn"]["bias"].astype(jnp.float32)
        mean = unit_s["bn"]["mean"].astype(jnp.float32)
        var = unit_s["bn"]["var"].astype(jnp.float32)
        g = gamma * jax.lax.rsqrt(var + _EPS)
        bias = beta + g * (cbias - mean)
    else:
        g = jnp.ones_like(cbias)
        bias = cbias
    s_w = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)),
                      1e-12) / 127.0
    wq = jnp.clip(jnp.round(kernel / s_w), -127, 127).astype(jnp.int8)
    return {"wq": wq, "gain": s_w * g, "bias": bias}, \
        (kernel * g).astype(jnp.bfloat16)


def _fc_consts(layer_p):
    kernel = layer_p["kernel"].astype(jnp.float32)       # (in, out)
    s_w = jnp.maximum(jnp.max(jnp.abs(kernel), axis=0), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(kernel / s_w), -127, 127).astype(jnp.int8)
    return {"wq": wq, "sw": s_w,
            "bias": layer_p["bias"].astype(jnp.float32)}


def _fc_i8(xq, s_in, fc, relu, s_out=None):
    y = jax.lax.dot_general(
        xq, fc["wq"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    y = y * (fc["sw"] * (s_in / 127.0)) + fc["bias"]
    if relu:
        y = jnp.maximum(y, 0.0)
    if s_out is None:
        return y
    return _quant(y, s_out)


def _maxpool2_i8(xq):
    return jax.lax.reduce_window(
        xq, jnp.int8(-128), jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
        [(0, 0)] * 4)


def _forward(qtree, x, scales):
    f = qtree["features"]
    stages = sorted(f, key=lambda s: int(s.replace("stage", "")))
    order = [(st, u) for st in stages
             for u in sorted(f[st], key=lambda u: int(u.replace("unit", "")))]
    # Input scale of each conv (from calibration); entry len(order) is
    # the fc1 input scale — the requant target of the last conv (pools
    # commute with quantization bit-exactly: both are monotone).
    s_list = [scales[f"features/{st}/{u}/conv"] for st, u in order]
    s_list.append(scales["output/fc1/fc"])

    # conv1_1 in folded bf16 (C_in=3 is MXU-layout-bound; quantizing the
    # image first buys nothing — same call as the ResNet bf16 stem).
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), qtree["kf0"], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y + f[order[0][0]][order[0][1]]["bias"], 0.0)
    xq = _quant(y, s_list[1])

    for i in range(1, len(order) + 1):
        st_prev = order[i - 1][0]
        if i == len(order) or order[i][0] != st_prev:
            xq = _maxpool2_i8(xq)            # stage boundary: 2x2/s2 pool
        if i < len(order):
            st, u = order[i]
            xq = _cell(xq, s_list[i], f[st][u], 1, True, s_list[i + 1])
    # NCHW-order flatten (models/shell.py:46) so fc weights map 1:1.
    b = xq.shape[0]
    xq = jnp.transpose(xq, (0, 3, 1, 2)).reshape(b, -1)
    s_fc1 = s_list[len(order)]
    h = _fc_i8(xq, s_fc1, qtree["fc1"], True, scales["output/fc2/fc"])
    h = _fc_i8(h, scales["output/fc2/fc"], qtree["fc2"], True,
               scales["output/fc3"])
    logits = _fc_i8(h, scales["output/fc3"], qtree["fc3"], False)
    return logits.astype(jnp.bfloat16)


def prepare_int8_vgg(model, scales: Dict[str, float]
                     ) -> Tuple[Callable, Dict]:
    """Serving entry point: quantize weights ONCE, return
    ``(infer_fn, qtree)`` with ``infer_fn(qtree, x) -> logits``."""
    params = model.variables["params"]
    stats = model.variables.get("batch_stats", {})
    qfeat, kf0 = {}, None
    for st in sorted(params["features"],
                     key=lambda s: int(s.replace("stage", ""))):
        units = params["features"][st]
        qfeat[st] = {}
        for u in sorted(units, key=lambda u: int(u.replace("unit", ""))):
            cell, kf = _conv_consts(
                units[u], stats.get("features", {}).get(st, {}).get(u, {}))
            if kf0 is None:
                kf0 = kf                  # folded bf16 first-conv kernel
            qfeat[st][u] = cell
    out = params["output"]
    qtree = {"features": qfeat, "kf0": kf0,
             "fc1": _fc_consts(out["fc1"]["fc"]),
             "fc2": _fc_consts(out["fc2"]["fc"]),
             "fc3": _fc_consts(out["fc3"])}

    def infer_fn(qtree, x):
        return _forward(qtree, x, scales)

    return infer_fn, qtree
