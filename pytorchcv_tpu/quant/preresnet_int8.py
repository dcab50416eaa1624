"""int8 serving pipeline for the pre-activation ResNet family
(PreResNet / SE-PreResNet — reference preresnet.py:19-143).

Pre-activation changes the quantization structure versus ResNet
(``resnet_int8.py``): each cell is bn -> ReLU -> conv, the residual
stream is never activation-bounded (its range grows with depth), and the
identity branch taps the *pre-activated* tensor. So here the residual
stream stays bf16 while everything inside a unit body runs int8:

    pre  = quant(relu(bn1(r)))            # fused elementwise chain
    h    = int8 conv1 -> epilogue folds *conv2's* bn+ReLU+requant
    ...
    r'   = r + dequant(conv_last(h))      # bf16 stream add
    id   = int8 identity_conv(pre)        # downsample units

Each conv's pre-bn folds into the *previous* conv's dequant epilogue
(per-channel gain/bias), so every intra-body tensor crosses HBM once as
int8. Activation scales come from the same ``calibrate_int8`` pass — the
calibrated conv-input amaxes are exactly the post-bn-ReLU tensors this
pipeline quantizes (and ``identity_conv`` is a bare ``nn.Conv``, so its
pre-activated input is calibrated under its own path).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .resnet_int8 import _conv_i8, _quant, _se_gate, _maxpool_i8, _EPS

__all__ = ["prepare_int8_preresnet"]


def _bn_affine(bn_params, bn_stats):
    g = bn_params["scale"].astype(jnp.float32) * jax.lax.rsqrt(
        bn_stats["var"].astype(jnp.float32) + _EPS)
    b = bn_params["bias"].astype(jnp.float32) - \
        bn_stats["mean"].astype(jnp.float32) * g
    return g, b


def _qweights(kernel):
    k = kernel.astype(jnp.float32)
    s_w = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(k / s_w), -127, 127).astype(jnp.int8)
    return wq, s_w


def _prep_cell(cell_params, cell_stats):
    """Pre-activation cell: {bn (applied to the cell INPUT), conv}."""
    wq, s_w = _qweights(cell_params["conv"]["kernel"])
    g, b = _bn_affine(cell_params["bn"], cell_stats["bn"])
    return {"wq": wq, "s_w": s_w, "g": g, "b": b}


def _pre_quant(x_f32, g, b, amax):
    """bn affine + ReLU + symmetric int8 quant, one fused chain."""
    y = jnp.maximum(x_f32 * g + b, 0.0)
    return _quant(y, amax)


def prepare_int8_preresnet(model, scales: Dict[str, float],
                           conv1_stride: Optional[bool] = None
                           ) -> Tuple[Callable, Dict]:
    """Quantize weights once; return ``(infer_fn, qtree)`` with
    ``infer_fn(qtree, x) -> logits`` for PreResNet-family models.

    ``conv1_stride``: pytorchcv rule — plain names True, 'b' suffix False
    (reference preresnet.py:179).
    """
    if conv1_stride is None:
        name = getattr(model, "name", "")
        conv1_stride = not name.rstrip("0123456789").endswith("b") \
            if name and name[-1].isdigit() else not name.endswith("b")

    params = model.variables["params"]
    stats = model.variables["batch_stats"]
    f, fs = params["features"], stats["features"]

    def prep(p, s):
        out = {}
        for k, v in p.items():
            if isinstance(v, dict) and "conv" in v and "bn" in v:
                out[k] = _prep_cell(v, s[k])
            elif isinstance(v, dict) and set(v) == {"kernel"}:
                wq, s_w = _qweights(v["kernel"])      # bare identity conv
                out[k] = {"wq": wq, "s_w": s_w}
            elif isinstance(v, dict) and "bn" in v and "conv" not in v \
                    and set(v) == {"bn"}:
                out[k] = {"g_b": _bn_affine(v["bn"], s[k]["bn"])}
            elif isinstance(v, dict):
                out[k] = prep(v, s.get(k, {}))
            else:
                out[k] = v
        return out

    qfeat = jax.jit(prep)(f, fs)
    # Stem stays bf16 (C_in=3 is layout-bound on any path; no reason to
    # add stem quantization error): keep the exact folded kernel.
    g0, b0 = _bn_affine(f["init_block"]["bn"],
                        fs["init_block"]["bn"])
    qfeat = dict(qfeat)
    qfeat["init_block"] = {
        "kf": f["init_block"]["conv"]["kernel"].astype(jnp.bfloat16),
        "g": g0, "b": b0}
    head = params["output"]
    qtree = {"features": qfeat,
             "output": {"kernel": head["kernel"].astype(jnp.bfloat16),
                        "bias": head["bias"].astype(jnp.float32)}}

    def infer_fn(qtree, x):
        return _forward(qtree, x, scales, conv1_stride)

    return infer_fn, qtree


def _forward(qtree, x, scales, conv1_stride):
    f = qtree["features"]
    sc = scales.__getitem__

    # Stem: plain conv7x7/s2 (bf16 — C_in=3, stays on XLA's conv path),
    # then the init bn+ReLU and maxpool on the bf16 stream.
    stem = f["init_block"]
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), stem["kf"], (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y * stem["g"] + stem["b"], 0.0)
    r = jax.lax.reduce_window(
        y.astype(jnp.bfloat16), jnp.asarray(-jnp.inf, jnp.bfloat16),
        jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])          # bf16 residual stream

    stage_names = sorted(k for k in f if k.startswith("stage"))
    for si, stage in enumerate(stage_names):
        unit_names = sorted(f[stage],
                            key=lambda u: int(u.replace("unit", "")))
        for ui, unit in enumerate(unit_names):
            uq = f[stage][unit]
            stride = 2 if (ui == 0 and si != 0) else 1
            body = uq["body"]
            prefix = f"features/{stage}/{unit}"
            bottleneck = "conv3" in body
            convs = ["conv1", "conv2", "conv3"] if bottleneck else \
                ["conv1", "conv2"]
            strides = [1] * len(convs)
            if bottleneck:
                strides[0 if conv1_stride else 1] = stride
            else:
                strides[0] = stride

            # pre-activation of the stream (conv1's bn) + quant
            c1 = body["conv1"]
            s1 = sc(f"{prefix}/body/conv1/conv")
            pre = _pre_quant(r.astype(jnp.float32), c1["g"], c1["b"], s1)

            h, h_scale = pre, s1 / 127.0
            for idx, cname in enumerate(convs):
                cell = body[cname]
                y = _conv_i8(h, cell["wq"], strides[idx]).astype(
                    jnp.float32) * (cell["s_w"] * h_scale)
                if idx + 1 < len(convs):
                    nxt = body[convs[idx + 1]]
                    s_n = sc(f"{prefix}/body/{convs[idx+1]}/conv")
                    h = _pre_quant(y, nxt["g"], nxt["b"], s_n)
                    h_scale = s_n / 127.0
            t = y                                     # f32 body output

            if "se" in uq:
                t = _se_gate(t.astype(jnp.bfloat16),
                             uq["se"]).astype(jnp.float32)

            if "identity_conv" in uq:
                idc = uq["identity_conv"]
                idf = _conv_i8(pre, idc["wq"], stride).astype(
                    jnp.float32) * (idc["s_w"] * (s1 / 127.0))
            else:
                idf = r.astype(jnp.float32)
            r = (t + idf).astype(jnp.bfloat16)

    gp, bp = f["post_activ"]["g_b"]
    out = jnp.maximum(r.astype(jnp.float32) * gp + bp, 0.0)
    feat = jnp.mean(out, axis=(1, 2))
    head = qtree["output"]
    logits = feat @ head["kernel"].astype(jnp.float32) + \
        head["bias"].astype(jnp.float32)
    return logits.astype(jnp.bfloat16)
