"""int8 end-to-end ResNet serving pipeline (flagship benchmark path).

The generic interception PTQ (``ptq.py``) quantizes each conv but stores
inter-layer activations in bf16, so resnet50 stays HBM-bound (~18k img/s
on v5e). This pipeline keeps activations **stored int8 between layers**:
each conv's epilogue fuses dequant (with the BN affine folded into the
per-channel scale) + ReLU + requant-to-the-next-layer's-scale, writing
int8 — halving activation HBM traffic and letting the int8 MXU run free.
The 7x7/s2 stem is rewritten via 2x2 space-to-depth into a 4x4/s1 conv
(3 -> 12 input channels: 4x the MXU lane utilization), and weights are
quantized ONCE up front (``prepare_int8_resnet``) so the steady-state
program never touches f32 kernels.

Built directly over the zoo ResNet's variables tree (reference
resnet.py:143-331 semantics: ResInitBlock 7x7/s2 + maxpool, ResUnit
body(+identity_conv) add + ReLU, bottleneck stride at conv1 when
``conv1_stride`` — pytorchcv resnet50 — else at conv2 — resnet50b).
Activation scales come from ``calibrate_int8``.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["int8_resnet_apply_fn", "prepare_int8_resnet"]

_EPS = 1e-5


def _cell_consts(cell_params, cell_stats):
    """Fold conv kernel + BN into {wq int8, gain, bias}.

    BN-less cells (the ImageNet WRN family, reference wrn.py:12 —
    conv + bias, no norm) fold to gain = s_w, bias = conv bias."""
    kernel = cell_params["conv"]["kernel"].astype(jnp.float32)
    s_w = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)),
                      1e-12) / 127.0
    wq = jnp.clip(jnp.round(kernel / s_w), -127, 127).astype(jnp.int8)
    if "bn" not in cell_params:
        bias = cell_params["conv"].get(
            "bias", jnp.zeros((kernel.shape[-1],))).astype(jnp.float32)
        return {"wq": wq, "gain": s_w, "bias": bias}
    gamma = cell_params["bn"]["scale"].astype(jnp.float32)
    beta = cell_params["bn"]["bias"].astype(jnp.float32)
    mean = cell_stats["bn"]["mean"].astype(jnp.float32)
    var = cell_stats["bn"]["var"].astype(jnp.float32)
    g = gamma * jax.lax.rsqrt(var + _EPS)
    return {"wq": wq, "gain": s_w * g, "bias": beta - mean * g}


def _conv_i8(xq, wq, stride, padding=None, dilation=1):
    k = wq.shape[0]
    pad = [(dilation * (k // 2),) * 2] * 2 if padding is None else padding
    groups = xq.shape[-1] // wq.shape[2]     # ResNeXt grouped conv2
    return jax.lax.conv_general_dilated(
        xq, wq, window_strides=(stride, stride), padding=pad,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32)


def _cell(xq, s_in, cell, stride=1, relu=True,
          s_out: Optional[float] = None, out_dtype=jnp.bfloat16,
          dilation=1):
    """int8 conv + folded BN (+ ReLU) (+ requant to int8 with amax s_out).

    ``xq``: int8, quantized with amax ``s_in``. Returns int8 when
    ``s_out`` is given, else ``out_dtype``.
    """
    y = _conv_i8(xq, cell["wq"], stride,
                 dilation=dilation).astype(jnp.float32)
    y = y * (cell["gain"] * (s_in / 127.0)) + cell["bias"]
    if relu:
        y = jnp.maximum(y, 0.0)
    if s_out is None:
        return y.astype(out_dtype)
    return jnp.clip(jnp.round(y * (127.0 / s_out)),
                    -127, 127).astype(jnp.int8)


def _quant(x, amax):
    return jnp.clip(jnp.round(x.astype(jnp.float32) * (127.0 / amax)),
                    -127, 127).astype(jnp.int8)


def _space_to_depth_stem(xq, wq):
    """Rewrite the 7x7/s2 stem as a 4x4/s1 conv over 2x2-blocked inputs.

    x: (B, H, W, 3) -> (B, (H+4)/2, (W+4)/2, 12) with channel
    c*4 + dy*2 + dx; kernel (7,7,3,O) zero-padded top-left to (8,8,3,O)
    -> (4,4,12,O): output(i,j) = sum_a,b x[2i+a-3, 2j+b-3] w[a,b] becomes,
    with a = 2*alpha+dy-1, a 4x4 stride-1 conv over blocks with block pad
    (1,0) — pixel pad 2 each side + the kernel's zero row/col reproduce
    torch pad 3 exactly.
    """
    b, h, w, c = xq.shape
    xp = jnp.pad(xq, ((0, 0), (2, 2), (2, 2), (0, 0)))
    hp, wp = h + 4, w + 4
    xs = xp.reshape(b, hp // 2, 2, wp // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 5, 2, 4).reshape(b, hp // 2, wp // 2, c * 4)
    kh, kw, ci, co = wq.shape            # (7,7,3,O)
    wp8 = jnp.pad(wq, ((1, 0), (1, 0), (0, 0), (0, 0)))   # top-left zeros
    ws = wp8.reshape(4, 2, 4, 2, ci, co)
    ws = ws.transpose(0, 2, 4, 1, 3, 5).reshape(4, 4, ci * 4, co)
    return xs, ws


def _maxpool_i8(xq, window=3, stride=2, padding=1):
    return jax.lax.reduce_window(
        xq, jnp.int8(-128), jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)])


def _resolve_conv1_stride(model, conv1_stride):
    if conv1_stride is None:
        name = getattr(model, "name", "")
        return not name.endswith("b")
    return conv1_stride


def _quantize_tree(params, stats):
    """Map every conv cell in the features tree to folded int8 consts;
    non-cell leaves (SE gate convs, biases) pass through in f32. A cell
    is {conv: {kernel,...}} with either a sibling bn (resnet families)
    or a conv bias (BN-less WRN, reference wrn.py:12)."""
    out = {}
    for k, v in params.items():
        if isinstance(v, dict) and "conv" in v \
                and isinstance(v["conv"], dict) and "kernel" in v["conv"] \
                and ("bn" in v or "bias" in v["conv"]):
            out[k] = _cell_consts(v, stats.get(k, {}))
        elif isinstance(v, dict):
            out[k] = _quantize_tree(v, stats.get(k, {}))
        else:
            out[k] = v
    return out


def _merge_grouped_weights(qfeat, group_block: int):
    """Densify grouped 3x3 kernels whose per-group width is below
    ``group_block``: the grouped conv becomes ONE dense conv with a
    block-diagonal (zero off-block) kernel — bit-exact, int32 sums
    identical.

    Measured (tools/exp_grouped.py + exp_gb_sweep.py, v5e, batch 384):
    XLA's int8 grouped-conv path is layout-hostile in context — resnext50
    e2e runs 57.9 ms with native grouped convs, 33.6 ms fully densified
    (6.6k -> 11.4k img/s) despite the groups-x padded MACs; per-stage
    truncation shows every stage improving except the last (cg=32:
    native 3.1 ms vs dense 4.5 ms), hence the width cutoff. Merged cells
    carry a ``gmerge`` marker so stride placement still follows the
    grouped (stride-at-conv2) rule.
    """
    for sk, stage in qfeat.items():
        if not sk.startswith("stage"):
            continue
        for uk, unit in stage.items():
            body = unit.get("body")
            if not body or "conv2" not in body or "conv1" not in body:
                continue
            w2 = body["conv2"]["wq"]
            cin = body["conv1"]["wq"].shape[3]
            cg = w2.shape[2]
            if cg >= cin or w2.shape[0] == 1:
                continue                       # not grouped
            groups = cin // cg
            merge = groups if cg < group_block else 1
            if merge <= 1:
                continue
            kh, kw, _, cout = w2.shape
            og = cout // groups
            wm = jnp.zeros((kh, kw, merge * cg, cout), w2.dtype)
            for g in range(groups):
                blk = g % merge
                wm = wm.at[:, :, blk * cg:(blk + 1) * cg,
                           g * og:(g + 1) * og].set(
                    w2[:, :, :, g * og:(g + 1) * og])
            cell = dict(body["conv2"])
            cell["wq"] = wm
            cell["gmerge"] = merge
            new_body = dict(body)
            new_body["conv2"] = cell
            new_unit = dict(unit)
            new_unit["body"] = new_body
            stage[uk] = new_unit
    return qfeat


def _se_gate(t, se):
    """Squeeze-excitation gate (reference att.py:38) on the bf16 pre-add
    tensor; all math on the pooled (B,1,1,C) vector — negligible cost.

    Handles both SE parameterizations in the zoo (nn/att.py SEBlock):
    1x1 convs (``conv1``/``conv2``, kernel (1,1,C,M)) and dense
    (``use_conv=False`` -> ``fc1``/``fc2``, kernel (C,M)) — e.g.
    fastseresnet101b stores the dense form."""
    def _mat(layer):
        k = layer["kernel"]
        if k.ndim == 4:
            k = k[0, 0]
        return k.astype(jnp.float32), layer["bias"].astype(jnp.float32)

    p = jnp.mean(t.astype(jnp.float32), axis=(1, 2), keepdims=True)
    k1, b1 = _mat(se["conv1"] if "conv1" in se else se["fc1"])
    h = jnp.maximum(jnp.einsum("bijc,cm->bijm", p, k1) + b1, 0.0)
    k2, b2 = _mat(se["conv2"] if "conv2" in se else se["fc2"])
    g = jax.nn.sigmoid(jnp.einsum("bijm,mc->bijc", h, k2) + b2)
    return (t.astype(jnp.float32) * g).astype(t.dtype)


def _forward(qtree, x, scales, conv1_stride, q_residual=False,
             q_identity=True):
    f = qtree["features"]
    sc = scales.__getitem__

    # Planar (B,3,H,W) input: the serving preprocess's native emission
    # (it computes per-channel planes). Isolated, the C_in=3 stem conv is
    # ~14% faster in NCHW (tools/exp_stem.py: 1.45 vs 1.68 ms batch-384
    # v5e); measured END-TO-END it is a wash (25.22k vs 25.22k img/s —
    # XLA hides the boundary transpose in either direction). Accepted
    # natively anyway: bit-exact, and lets the serving boundary hand over
    # whichever layout its producer already has.
    planar = x.ndim == 4 and x.shape[1] == 3 and x.shape[-1] != 3

    s_u1 = sc("features/stage1/unit1/body/conv1/conv")
    if "conv" not in f["init_block"]:
        if planar:
            x = jnp.transpose(x, (0, 2, 3, 1))
        # Deep 3-conv stem (SENet SEInitBlock): conv1 (C_in=3) in folded
        # bf16, conv2/conv3 int8, maxpool int8.
        ib = f["init_block"]
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), ib["conv1"]["kf"], (2, 2),
            [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = jnp.maximum(y + ib["conv1"]["bias"], 0.0)
        s2 = sc("features/init_block/conv2/conv")
        s3 = sc("features/init_block/conv3/conv")
        xq = _quant(y, s2)
        xq = _cell(xq, s2, ib["conv2"], 1, True, s3)
        xq = _cell(xq, s3, ib["conv3"], 1, True, s_u1)
        xq = _maxpool_i8(xq)
        s_in = s_u1
    else:
        stem = f["init_block"]["conv"]
        if "kf" in stem and planar:
            y = jax.lax.conv_general_dilated(
                x.astype(jnp.bfloat16), stem["kf"], (2, 2),
                [(3, 3), (3, 3)],
                dimension_numbers=("NCHW", "HWIO", "NCHW"),
                preferred_element_type=jnp.float32)
            y = jnp.maximum(y + stem["bias"][None, :, None, None], 0.0)
            q = _quant(y, s_u1)
            p = jax.lax.reduce_window(
                q, jnp.int8(-128), jax.lax.max, (1, 1, 3, 3),
                (1, 1, 2, 2), [(0, 0), (0, 0), (1, 1), (1, 1)])
            xq = jnp.transpose(p, (0, 2, 3, 1))
            s_in = s_u1
        else:
            if planar:
                x = jnp.transpose(x, (0, 2, 3, 1))
            if "kf" in stem:
                # bf16 folded stem (measured fastest: the C_in=3 conv is
                # layout-bound, so skipping the image quant + s2d
                # transposes wins ~0.5 ms/batch-384 over int8
                # space-to-depth).
                y = jax.lax.conv_general_dilated(
                    x.astype(jnp.bfloat16), stem["kf"], (2, 2),
                    [(3, 3), (3, 3)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32)
                y = jnp.maximum(y + stem["bias"], 0.0)
            else:
                s_img = sc("features/init_block/conv/conv")
                xq = _quant(x, s_img)
                xs, ws = _space_to_depth_stem(xq, stem["wq"])
                y = _conv_i8(xs, ws, 1,
                             [(1, 0), (1, 0)]).astype(jnp.float32)
                y = jnp.maximum(y * (stem["gain"] * (s_img / 127.0)) +
                                stem["bias"], 0.0)
            xq = _maxpool_i8(_quant(y, s_u1))
            s_in = s_u1

    stage_names = sorted(k for k in f if k.startswith("stage"))
    last_stage = stage_names[-1]
    out = None
    for si, stage in enumerate(stage_names):
        unit_names = sorted(f[stage],
                            key=lambda u: int(u.replace("unit", "")))
        for ui, unit in enumerate(unit_names):
            uq = f[stage][unit]
            stride = 2 if (ui == 0 and si != 0) else 1
            body = uq["body"]
            prefix = f"features/{stage}/{unit}/body"
            bottleneck = "conv3" in body
            nxt = None  # next conv1's input scale = this unit's out scale
            if ui + 1 < len(unit_names):
                nxt = f"features/{stage}/{unit_names[ui+1]}/body/conv1/conv"
            elif stage != last_stage:
                nxt = f"features/{stage_names[si+1]}/unit1/body/conv1/conv"
            s_next = sc(nxt) if nxt else None
            has_se = "se" in uq
            # q_residual may be a bool (whole net) or a collection of
            # stage names (e.g. {"stage1","stage2"}: quantized-domain
            # residual carry only in the HBM-bound early stages).
            use_qres = (q_residual is True or
                        (not isinstance(q_residual, bool) and
                         stage in q_residual))
            if bottleneck:
                grouped = ("gmerge" in body["conv2"] or
                           body["conv2"]["wq"].shape[2] !=
                           body["conv1"]["wq"].shape[3])
                # ResNeXt always strides at the grouped 3x3.
                c1s = False if grouped else conv1_stride
                s1, s2 = (stride, 1) if c1s else (1, stride)
                # NOTE: an A/B'd hybrid (grouped 3x3 in bf16 between int8
                # 1x1s) measured slower than full int8 on v5e (5.8k vs
                # 6.6k img/s for resnext50) — the extra dtype transitions
                # cost more than the small-group MXU waste. Full int8.
                t = _cell(xq, s_in, body["conv1"], s1, True,
                          sc(f"{prefix}/conv2/conv"))
                t = _cell(t, sc(f"{prefix}/conv2/conv"), body["conv2"],
                          s2, True, sc(f"{prefix}/conv3/conv"))
                last_cell, s_last = body["conv3"], sc(f"{prefix}/conv3/conv")
            else:
                t = _cell(xq, s_in, body["conv1"], stride, True,
                          sc(f"{prefix}/conv2/conv"))
                last_cell, s_last = body["conv2"], sc(f"{prefix}/conv2/conv")
            if nxt is None or not use_qres or has_se:
                # bf16-domain residual add (default: measured faster on
                # v5e — int8 elementwise adds widen to int32 on the VPU
                # and break the conv epilogue fusion).
                t = _cell(t, s_last, last_cell, 1, False)
                if has_se:
                    t = _se_gate(t, uq["se"])
                if "identity_conv" in uq:
                    if q_identity and s_next is not None:
                        # The downsample identity conv is the one tensor
                        # the add cannot fuse away (two conv producers);
                        # write it int8 at the unit output scale instead
                        # of bf16 — halves its bytes (TensorRT-style
                        # residual quantization, on this tensor only:
                        # full q_residual measured slower e2e).
                        qid = _cell(xq, s_in, uq["identity_conv"], stride,
                                    False, s_next)
                        idf = qid.astype(jnp.float32) * (s_next / 127.0)
                    else:
                        idf = _cell(xq, s_in, uq["identity_conv"], stride,
                                    False)
                else:
                    idf = (xq.astype(jnp.float32) *
                           (s_in / 127.0)).astype(jnp.bfloat16)
                y = jnp.maximum(t.astype(jnp.float32) +
                                idf.astype(jnp.float32), 0.0)
                if nxt is None:
                    out = y.astype(jnp.bfloat16)
                else:
                    s_in = s_next
                    xq = _quant(y, s_in)
            else:
                # Residual add in the quantized domain (TensorRT-style):
                # both operands requantized to the unit's output scale, so
                # no bf16 tensor ever materializes — conv epilogues write
                # int8 and the add+ReLU fuses over int8 operands.
                t = _cell(t, s_last, last_cell, 1, False, s_next)
                if "identity_conv" in uq:
                    qid = _cell(xq, s_in, uq["identity_conv"], stride,
                                False, s_next)
                else:
                    qid = jnp.clip(
                        jnp.round(xq.astype(jnp.float32) *
                                  (s_in / s_next)), -127, 127
                    ).astype(jnp.int8)
                acc = t.astype(jnp.int32) + qid.astype(jnp.int32)
                xq = jnp.clip(acc, 0, 127).astype(jnp.int8)  # fused ReLU
                s_in = s_next
    feat = jnp.mean(out.astype(jnp.float32), axis=(1, 2))
    head = qtree["output"]
    logits = feat @ head["kernel"].astype(jnp.float32) + \
        head["bias"].astype(jnp.float32)
    return logits.astype(jnp.bfloat16)


def prepare_int8_resnet(model, scales: Dict[str, float],
                        conv1_stride: Optional[bool] = None,
                        q_residual: bool = False,
                        group_block: Optional[int] = 32,
                        q_identity: bool = True
                        ) -> Tuple[Callable, Dict]:
    """Serving entry point: quantize weights ONCE, return
    ``(infer_fn, qparams)`` with ``infer_fn(qparams, x) -> logits``.

    The steady-state compiled program reads only int8 kernels plus
    per-channel f32 gain/bias — f32 weights never enter the hot loop.
    ``group_block``: grouped 3x3 kernels (ResNeXt/SENet) with fewer than
    this many channels per group are densified into one block-diagonal
    dense conv (see ``_merge_grouped_weights``); None disables.
    ``q_residual``: True for quantized-domain residual adds everywhere,
    or a collection of stage names ({"stage1", "stage2"}) to restrict the
    carry to specific stages.
    """
    c1s = _resolve_conv1_stride(model, conv1_stride)
    params = model.variables["params"]
    # BN-less families (ImageNet WRN) carry no batch_stats collection.
    stats = model.variables.get("batch_stats", {"features": {}})
    qparams = jax.jit(_quantize_tree)(params["features"],
                                      stats.get("features", {}))
    qparams = {k: dict(v) if isinstance(v, dict) else v
               for k, v in qparams.items()}
    if group_block:
        qparams = _merge_grouped_weights(qparams, group_block)
    # Exact bf16 folded stem kernel (kernel * bn-gain) for the first
    # conv; bias already lives in the quantized cell consts.
    first = "conv" if "conv" in params["features"]["init_block"] \
        else "conv1"
    stem_p = params["features"]["init_block"][first]
    if "bn" in stem_p:
        stem_s = stats["features"]["init_block"][first]
        g0 = stem_p["bn"]["scale"].astype(jnp.float32) * jax.lax.rsqrt(
            stem_s["bn"]["var"].astype(jnp.float32) + _EPS)
    else:
        g0 = jnp.ones((), jnp.float32)
    qparams = dict(qparams)
    qparams["init_block"] = dict(qparams["init_block"])
    qparams["init_block"][first] = dict(qparams["init_block"][first])
    qparams["init_block"][first]["kf"] = (
        stem_p["conv"]["kernel"].astype(jnp.float32) * g0
    ).astype(jnp.bfloat16)
    head = params["output"]
    if "kernel" not in head:          # senet nests the Linear under 'fc'
        head = head["fc"]
    qtree = {"features": qparams,
             "output": {"kernel": head["kernel"].astype(jnp.bfloat16),
                        "bias": head["bias"].astype(jnp.float32)}}

    def infer_fn(qtree, x):
        return _forward(qtree, x, scales, c1s, q_residual, q_identity)

    return infer_fn, qtree


def int8_resnet_apply_fn(model, scales: Dict[str, float],
                         conv1_stride: Optional[bool] = None) -> Callable:
    """Jittable ``(variables, x) -> logits`` quantizing weights in-graph
    (convenient for tests; use ``prepare_int8_resnet`` for serving)."""
    c1s = _resolve_conv1_stride(model, conv1_stride)

    def fn(variables, x):
        params = variables["params"]
        stats = variables["batch_stats"]
        qfeat = _quantize_tree(params["features"], stats["features"])
        first = "conv" if "conv" in params["features"]["init_block"] \
            else "conv1"
        stem_p = params["features"]["init_block"][first]
        stem_s = stats["features"]["init_block"][first]
        g0 = stem_p["bn"]["scale"].astype(jnp.float32) * jax.lax.rsqrt(
            stem_s["bn"]["var"].astype(jnp.float32) + _EPS)
        qfeat = dict(qfeat)
        qfeat["init_block"] = dict(qfeat["init_block"])
        qfeat["init_block"][first] = dict(qfeat["init_block"][first])
        qfeat["init_block"][first]["kf"] = (
            stem_p["conv"]["kernel"].astype(jnp.float32) * g0
        ).astype(jnp.bfloat16)
        head = params["output"]
        if "kernel" not in head:
            head = head["fc"]
        qtree = {"features": qfeat, "output": head}
        return _forward(qtree, x, scales, c1s)

    return fn
