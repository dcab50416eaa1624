"""int8-storage serving for positional ResNet trunks: the dilated
ResNet(D) segmentation backbone and SimplePose's plain resnet-b trunk.

The PSPNet/DeepLabv3/FCN heads ride a shared ``segmentation_backbone``
(models/pspnet.py:23 — reference pspnet.py:276-280: ``resnetd50b(...)
.features`` minus the final pool): SEInitBlock deep stem, stage2 the
only strided stage, stages 3/4 dilated (reference resnetd.py:15-103).
The dense-prediction serving path was compute-bound at ~99% of the bf16
FLOP roofline (STATUS.md pspnet 425 img/s at 480²) — exactly the case
the int8 MXU doubles. This pipeline mirrors quant/resnet_int8.py
(weights folded+quantized once, activations stored int8 between units,
bf16 residual adds) over the positional-keyed backbone tree
("0" init / "1".."4" stages), with per-unit dilation:
``2 ** max(0, stage_i - 1 - (unit_j == 0))`` (resnetd.py:48), stride 2
only at stage2/unit1, stride at conv2 (conv1_stride=False).

Returns BOTH backbone outputs (stage4, stage3 bend) in bf16; the model's
head consumes them via ``__call__(..., from_features=True)``.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from .resnet_int8 import (_EPS, _cell, _maxpool_i8, _quant,
                          _quantize_tree, _se_gate)

__all__ = ["is_seg_resnetd_backbone", "prepare_int8_seg_backbone",
           "is_plain_resnet_trunk", "prepare_int8_plain_trunk"]


def is_seg_resnetd_backbone(variables) -> bool:
    """True for the positional resnetd-b deep-stem backbone tree that
    this pipeline understands (bottleneck units, no SE)."""
    p = variables.get("params", {})
    bb = p.get("backbone")
    if not isinstance(bb, dict) or set(bb) != {"0", "1", "2", "3", "4"}:
        return False
    init = bb["0"]
    if not all(f"conv{i}" in init for i in (1, 2, 3)):
        return False
    for sk in ("1", "2", "3", "4"):
        stage = bb[sk]
        if not isinstance(stage, dict) or "unit1" not in stage:
            return False
        for unit in stage.values():
            body = unit.get("body") if isinstance(unit, dict) else None
            if not body or "conv3" not in body or "se" in unit or \
                    "identity_block" in unit:  # resneta avg-pool downsample
                return False
            cell = body.get("conv1")
            if not (isinstance(cell, dict) and "conv" in cell
                    and "bn" in cell):
                return False
    return "backbone" in variables.get("batch_stats", {})


def _unit_geometry_dilated(si: int, uj: int) -> Tuple[int, int]:
    """(stride, dilation) for stage ``si`` (1-based), unit ``uj``
    (1-based) — reference resnetd.py:47-48."""
    stride = 2 if (si == 2 and uj == 1) else 1
    dilation = 2 ** max(0, (si - 1) - 1 - int(uj == 1))
    return stride, dilation


def _unit_geometry_plain(si: int, uj: int) -> Tuple[int, int]:
    """Plain classification-trunk strides (reference resnet.py:294):
    stride 2 at unit1 of stages 2-4, never dilated."""
    return (2 if (si != 1 and uj == 1) else 1), 1


def _forward(qtree, x, scales, geometry, bend_stage=None):
    sc = scales.__getitem__
    f = qtree

    s_u1 = sc("backbone/1/unit1/body/conv1/conv")
    ib = f["0"]
    if "conv2" in ib:
        # Deep 3-conv stem: conv1 (C_in=3) folded bf16, conv2/3 int8.
        s_c2 = sc("backbone/0/conv2/conv")
        s_c3 = sc("backbone/0/conv3/conv")
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), ib["conv1"]["kf"], (2, 2),
            [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = jnp.maximum(y + ib["conv1"]["bias"], 0.0)
        xq = _quant(y, s_c2)
        xq = _cell(xq, s_c2, ib["conv2"], 1, True, s_c3)
        xq = _cell(xq, s_c3, ib["conv3"], 1, True, s_u1)
    else:
        # ResInitBlock: 7x7/s2 folded bf16 (C_in=3 is layout-bound in
        # int8 — same finding as quant/resnet_int8.py), then int8.
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), ib["conv"]["kf"], (2, 2),
            [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = jnp.maximum(y + ib["conv"]["bias"], 0.0)
        xq = _quant(y, s_u1)
    xq = _maxpool_i8(xq)
    s_in = s_u1

    bend = None
    out = None
    for si in (1, 2, 3, 4):
        stage = f[str(si)]
        unit_names = sorted(stage, key=lambda u: int(u.replace("unit", "")))
        for uj, unit in enumerate(unit_names, start=1):
            uq = stage[unit]
            stride, dilation = geometry(si, uj)
            body = uq["body"]
            prefix = f"backbone/{si}/{unit}/body"
            # scale feeding the next unit's conv1 (or None at the end)
            if uj < len(unit_names):
                nxt = f"backbone/{si}/{unit_names[uj]}/body/conv1/conv"
            elif si < 4:
                nxt = f"backbone/{si + 1}/unit1/body/conv1/conv"
            else:
                nxt = None
            s_next = sc(nxt) if nxt else None

            if "conv3" in body:
                # Bottleneck, conv1_stride=False (resnet*b / resnetd*b):
                # stride and dilation at the 3x3 conv2.
                t = _cell(xq, s_in, body["conv1"], 1, True,
                          sc(f"{prefix}/conv2/conv"))
                t = _cell(t, sc(f"{prefix}/conv2/conv"), body["conv2"],
                          stride, True, sc(f"{prefix}/conv3/conv"),
                          dilation=dilation)
                t = _cell(t, sc(f"{prefix}/conv3/conv"), body["conv3"], 1,
                          False)
            else:
                # Basic block (resnet18/34, never dilated — ResBlock has
                # no dilation arg): conv1 strided, conv2 plain.
                t = _cell(xq, s_in, body["conv1"], stride, True,
                          sc(f"{prefix}/conv2/conv"))
                t = _cell(t, sc(f"{prefix}/conv2/conv"), body["conv2"], 1,
                          False)
            if "se" in uq:
                t = _se_gate(t, uq["se"])
            if "identity_conv" in uq:
                if s_next is not None:
                    # int8 identity at the unit output scale (the one
                    # tensor the add can't fuse away — resnet_int8.py).
                    qid = _cell(xq, s_in, uq["identity_conv"], stride,
                                False, s_next)
                    idf = qid.astype(jnp.float32) * (s_next / 127.0)
                else:
                    idf = _cell(xq, s_in, uq["identity_conv"], stride,
                                False)
            else:
                idf = (xq.astype(jnp.float32) *
                       (s_in / 127.0)).astype(jnp.bfloat16)
            y = jnp.maximum(t.astype(jnp.float32) + idf.astype(jnp.float32),
                            0.0)
            is_bend = (si == bend_stage and uj == len(unit_names))
            if is_bend:
                bend = y.astype(jnp.bfloat16)
            if nxt is None:
                out = y.astype(jnp.bfloat16)
            else:
                s_in = s_next
                xq = _quant(y, s_in)
    return out, bend


def _prepare_trunk(model, scales, geometry, bend_stage):
    params = model.variables["params"]["backbone"]
    stats = model.variables["batch_stats"]["backbone"]
    qtree = jax.jit(_quantize_tree)(params, stats)
    qtree = {k: dict(v) if isinstance(v, dict) else v
             for k, v in qtree.items()}
    first = "conv1" if "conv1" in params["0"] else "conv"
    stem_p = params["0"][first]
    stem_s = stats["0"][first]
    g0 = stem_p["bn"]["scale"].astype(jnp.float32) * jax.lax.rsqrt(
        stem_s["bn"]["var"].astype(jnp.float32) + _EPS)
    qtree["0"] = dict(qtree["0"])
    qtree["0"][first] = dict(qtree["0"][first])
    qtree["0"][first]["kf"] = (
        stem_p["conv"]["kernel"].astype(jnp.float32) * g0
    ).astype(jnp.bfloat16)

    def fn(qtree, x):
        return _forward(qtree, x, scales, geometry, bend_stage)

    return fn, qtree


def prepare_int8_seg_backbone(model, scales: Dict[str, float]
                              ) -> Tuple[Callable, Dict]:
    """Quantize the dilated seg backbone once; return ``(fn, qtree)``
    with ``fn(qtree, x_bf16) -> (stage4, stage3_bend)`` both bf16."""
    return _prepare_trunk(model, scales, _unit_geometry_dilated,
                          bend_stage=3)


def is_plain_resnet_trunk(variables) -> bool:
    """True for a plain positional resnet(-b) trunk (7x7 stem, no
    dilation, no SE) — SimplePose (simplepose_coco.py:92) and CenterNet
    (centernet.py:156) backbones."""
    p = variables.get("params", {})
    bb = p.get("backbone")
    if not isinstance(bb, dict) or set(bb) != {"0", "1", "2", "3", "4"}:
        return False
    init = bb["0"]
    if set(init) != {"conv"} or "kernel" not in init["conv"].get(
            "conv", {}):
        return False
    for sk in ("1", "2", "3", "4"):
        stage = bb[sk]
        if not isinstance(stage, dict) or "unit1" not in stage:
            return False
        for unit in stage.values():
            body = unit.get("body") if isinstance(unit, dict) else None
            if not body or "identity_block" in unit:
                return False
            if "se" in unit and not ({"conv1", "conv2"} <= set(unit["se"])
                                     or {"fc1", "fc2"} <= set(unit["se"])):
                return False
            cell = body.get("conv1")
            if not (isinstance(cell, dict) and "conv" in cell
                    and "bn" in cell):
                return False
            # grouped 3x3s (resnext pose trunks) are not handled here
            if "conv3" in body:
                c2 = body["conv2"]["conv"]["kernel"]
                if c2.shape[2] != body["conv1"]["conv"]["kernel"].shape[3]:
                    return False
    return "backbone" in variables.get("batch_stats", {})


def prepare_int8_plain_trunk(model, scales: Dict[str, float]
                               ) -> Tuple[Callable, Dict]:
    """Quantize a plain resnet trunk once; return ``(fn, qtree)`` with
    ``fn(qtree, x_bf16) -> stage4 features`` (bf16)."""
    fn2, qtree = _prepare_trunk(model, scales, _unit_geometry_plain,
                                bend_stage=None)

    def fn(qtree, x):
        return fn2(qtree, x)[0]

    return fn, qtree
