"""int8-storage serving for the Jasper/JasperDR ASR family.

Jasper's trunk (reference jasper.py:694-977: stacks of length-masked
dense 1D convs, kernels 11-29 wide, 256-1024 channels, BN+ReLU
epilogues) is the zoo's heaviest compute-per-sample model — jasperdr10x5
runs ~85 GFLOP/2 per 15 s utterance — and, like VGG/DarkNet (the two
generic-int8 winners), it is a pure conv+BN+ReLU pipeline with no
SE/swish epilogues to erase the int8 MXU gain (386 TOP/s vs 197 bf16
TFLOP/s on v5e).

Dataflow (mirrors quant/vgg_int8.py conventions):
- the mel front-end stays f32 (bf16 audio is ~8-bit-relative; see
  models/jasper.py) — features are quantized once after extraction;
- every MaskConv1d (init block, unit bodies, 1x1 identity/dense-residual
  blocks, final dilated + wide convs) runs int8 x int8 -> int32 on the
  MXU; the epilogue fuses BN-folded dequant + ReLU + requant to the next
  conv's calibrated scale, storing activations int8 end to end;
- length masking commutes with symmetric quantization (masked positions
  are exactly 0 in both domains); masks are applied on the int8 tensors
  at each requant point, and per-conv output lengths are recomputed with
  the reference MaskConv1d formula (jasper.py:375);
- residual adds (body tail + identity / dense-residual sum) run in f32
  exactly like the ResNet pipeline's bf16 residuals — measured fastest
  there, and the quantized-domain alternative was rejected on-chip;
- dense-residual (jasperdr) keeps each unit input in its OWN int8
  buffer + scale, so unit i's identity sum reuses the already-quantized
  tensors with zero extra quantization traffic;
- the (1,)-kernel CTC head runs bf16 (29 output channels — too thin for
  the int8 MXU to matter).

QuartzNet (use_dw=True) is NOT routed here: its trunk is depthwise
separable, and the depthwise-family A/Bs (quant/efficientnet_int8.py,
tools/exp_effnet_unit.py) measured int8 a loss there; quartznet stays
bf16.

Scales come from ``calibrate_int8`` (ptq.py), which records MaskConv1d
inputs via ``_is_conv1d_call``.

Measured (v5e, one chip, batch 8, 15 s utterances, incl. the f32 mel
front-end): jasperdr10x5_en 16.57 ms -> 482.7 utt/s, RTFx 7,241 (bf16:
RTFx 4,848 — 1.49x); jasper10x5 11.31 ms -> 707.1 utt/s, RTFx 10,606.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from .resnet_int8 import _quant

__all__ = ["prepare_int8_jasper", "is_plain_jasper"]

_EPS = 1e-3  # jasper bn_eps (models/jasper.py:221)


def is_plain_jasper(model) -> bool:
    """True for dense-conv Jasper/JasperDR (not QuartzNet: use_dw)."""
    m = model.module
    return (type(m).__name__ == "Jasper" and not getattr(m, "use_dw", True))


def _cell_consts(block_p, block_s):
    """Fold MaskConvBlock1d conv kernel (+bias) + BN into
    {wq int8 (K,I,O), gain, bias} (input-scale applied at call time)."""
    kernel = block_p["conv"]["kernel"].astype(jnp.float32)
    s_w = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1)), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(kernel / s_w), -127, 127).astype(jnp.int8)
    cbias = block_p["conv"].get("bias")
    cbias = (cbias.astype(jnp.float32) if cbias is not None
             else jnp.zeros((kernel.shape[-1],), jnp.float32))
    gamma = block_p["bn"]["scale"].astype(jnp.float32)
    beta = block_p["bn"]["bias"].astype(jnp.float32)
    mean = block_s["bn"]["mean"].astype(jnp.float32)
    var = block_s["bn"]["var"].astype(jnp.float32)
    g = gamma * jax.lax.rsqrt(var + _EPS)
    return {"wq": wq, "gain": s_w * g, "bias": beta + g * (cbias - mean)}


def _mask(x, x_len, value=0):
    t = jnp.arange(x.shape[1])[None, :, None]
    return jnp.where(t >= x_len[:, None, None], jnp.asarray(value, x.dtype),
                     x)


def _conv_len(x_len, k, stride=1, dilation=1, padding=None):
    p = (k // 2) if padding is None else padding
    return (x_len + 2 * p - dilation * (k - 1) - 1) // stride + 1


def _cell1d(xq, s_in, cell, stride=1, dilation=1, relu=True, s_out=None,
            padding=None):
    """int8 1D conv + folded BN (+ ReLU) (+ requant). Padding follows the
    reference block constructors: k//2 for unit convs, 2*k//2 - 1 (= k-1,
    length-preserving) with dilation 2 for the final block's conv1
    (jasper.py:786-791)."""
    k = cell["wq"].shape[0]
    pad = (k // 2) if padding is None else padding
    y = jax.lax.conv_general_dilated(
        xq, cell["wq"], window_strides=(stride,), padding=((pad, pad),),
        rhs_dilation=(dilation,), dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    y = y * (cell["gain"] * (s_in / 127.0)) + cell["bias"]
    if relu:
        y = jnp.maximum(y, 0.0)
    if s_out is None:
        return y
    return _quant(y, s_out)


def _quantize_tree(params, stats):
    feat_p, feat_s = params["features"], stats["features"]
    units = sorted((k for k in feat_p if k.startswith("unit")),
                   key=lambda u: int(u.replace("unit", "")))
    qtree = {
        "init": _cell_consts(feat_p["init_block"], feat_s["init_block"]),
        "units": [],
        "final1": _cell_consts(feat_p["final_block"]["conv1"],
                               feat_s["final_block"]["conv1"]),
        "final2": _cell_consts(feat_p["final_block"]["conv2"],
                               feat_s["final_block"]["conv2"]),
        "head_k": params["output"]["kernel"][0].astype(jnp.bfloat16),
        "head_b": params["output"]["bias"].astype(jnp.bfloat16),
    }
    for u in units:
        up, us = feat_p[u], feat_s[u]
        body = sorted(up["body"], key=lambda b: int(b.replace("block", "")))
        qu = {"body": [_cell_consts(up["body"][b], us["body"][b])
                       for b in body]}
        idp, ids = up["identity_block"], us["identity_block"]
        if "conv" in idp:                       # plain residual
            qu["identity"] = [_cell_consts(idp, ids)]
        else:                                    # dense residual (jasperdr)
            blocks = sorted(idp, key=lambda b: int(b.replace("block", "")))
            qu["identity"] = [_cell_consts(idp[b], ids[b]) for b in blocks]
        qtree["units"].append(qu)
    return qtree


def prepare_int8_jasper(model, scales: Dict[str, float]
                        ) -> Tuple[Callable, Dict]:
    """Serving entry point: quantize weights ONCE, return
    ``(infer_fn, qtree)`` with ``infer_fn(qtree, x, x_len) ->
    (logits bf16, out_lens)``. ``x`` is waveform when the model was
    built ``from_audio`` (the default), else (B, T, C) mel features.
    """
    if not is_plain_jasper(model):
        raise ValueError("prepare_int8_jasper serves dense-conv "
                         "Jasper/JasperDR only (QuartzNet stays bf16)")
    m = model.module
    params = model.variables["params"]
    stats = model.variables.get("batch_stats", {})
    qtree = _quantize_tree(params, stats)
    use_dr = bool(m.use_dr)
    from_audio = bool(m.from_audio)
    n_units = len(qtree["units"])

    s_init = scales["features/init_block/conv"]
    s_unit = [scales[f"features/unit{i + 1}/body/block1/conv"]
              for i in range(n_units)]
    s_body = [[scales[f"features/unit{i + 1}/body/block{j + 1}/conv"]
               for j in range(len(qtree["units"][i]["body"]))]
              for i in range(n_units)]
    s_final1 = scales["features/final_block/conv1/conv"]
    s_final2 = scales["features/final_block/conv2/conv"]
    s_head = scales["output"]

    if from_audio:
        from ..models.jasper import NemoMelSpecExtractor
        extractor = NemoMelSpecExtractor(dither=0.0)

    def infer_fn(qtree, x, x_len):
        if from_audio:
            x, x_len = extractor.apply({}, x.astype(jnp.float32), x_len)
        # init block: stride-2 masked conv
        k0 = qtree["init"]["wq"].shape[0]
        xq = _mask(_quant(x, s_init), x_len)
        xq = _cell1d(xq, s_init, qtree["init"], stride=2, s_out=s_unit[0])
        x_len = _conv_len(x_len, k0, stride=2)
        xq = _mask(xq, x_len)

        dr_bufs = []                        # (int8 unit input, its scale)
        for i, qu in enumerate(qtree["units"]):
            s_in = s_unit[i]
            dr_bufs.append((xq, s_in))
            # body: all stride-1, length-preserving (odd k, pad k//2)
            t, s = xq, s_in
            nb = len(qu["body"])
            for j, cell in enumerate(qu["body"]):
                if j < nb - 1:
                    t = _mask(_cell1d(t, s, cell, s_out=s_body[i][j + 1]),
                              x_len)
                    s = s_body[i][j + 1]
                else:
                    y = _cell1d(t, s, cell, relu=False)      # f32
            # identity: plain 1x1 of the unit input, or the dense-
            # residual sum of 1x1s of ALL previous unit inputs.
            srcs = dr_bufs if use_dr else [dr_bufs[-1]]
            ident = None
            for (zq, sz), cell in zip(srcs, qu["identity"]):
                zi = _cell1d(zq, sz, cell, relu=False)
                ident = zi if ident is None else ident + zi
            out = jnp.maximum(y + ident, 0.0)
            s_next = s_unit[i + 1] if i + 1 < n_units else s_final1
            xq = _mask(_quant(out, s_next), x_len)

        # final block: dilated length-preserving conv1 + wide conv2
        k1 = qtree["final1"]["wq"].shape[0]
        xq = _cell1d(xq, s_final1, qtree["final1"], dilation=2,
                     padding=k1 - 1, s_out=s_final2)
        x_len = _conv_len(x_len, k1, dilation=2, padding=k1 - 1)
        xq = _mask(xq, x_len)
        xq = _cell1d(xq, s_final2, qtree["final2"], s_out=s_head)
        xq = _mask(xq, x_len)
        # CTC head: bf16 (29-ch output is MXU-thin)
        h = xq.astype(jnp.bfloat16) * jnp.asarray(s_head / 127.0,
                                                  jnp.bfloat16)
        logits = h @ qtree["head_k"] + qtree["head_b"]
        return logits, x_len

    return infer_fn, qtree
