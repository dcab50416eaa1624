"""Generic post-training int8 quantization via linen method interception.

Works on every zoo model without touching model code: all conv compute
flows through ``flax.linen.Conv`` (``nn/conv.py``), so an
``nn.intercept_methods`` interceptor can (a) record per-layer activation
ranges during a calibration pass and (b) swap each dense conv for an
int8 x int8 -> int32 MXU conv at inference.

Scheme (TensorRT-style symmetric PTQ):
- activations: per-tensor symmetric, scale = amax/127 from calibration
  (max over calibration batches);
- weights: per-output-channel symmetric, scale = amax/127, computed from
  the f32 params inside the jitted program (constant-foldable);
- accumulation in int32, dequantized to f32 with the product scale, bias
  added in f32, BN/activation epilogues untouched (VPU work, XLA-fused).

Grouped/depthwise convs stay in the float path (HBM-bound, no MXU win),
as do all non-conv layers.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["calibrate_int8", "int8_apply_fn", "quantize_model"]


def _pair(v):
    if isinstance(v, int):
        return (v, v)
    return tuple(v)


def _lax_padding(padding, kernel_size):
    """Normalize flax Conv ``padding`` to what lax.conv accepts."""
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return [(padding, padding)] * len(_pair(kernel_size))
    out = []
    for p in padding:
        out.append((p, p) if isinstance(p, int) else tuple(p))
    return out


def _is_conv_call(mod, method_name: str, args) -> bool:
    return (isinstance(mod, nn.Conv) and method_name == "__call__"
            and args and hasattr(args[0], "ndim") and args[0].ndim == 4)


def _is_dense_call(mod, method_name: str, args) -> bool:
    # Recorded for pipelines that quantize FC heads (VGG/AlexNet-class);
    # the generic quantizer never swaps Dense layers, so the extra scale
    # entries are inert elsewhere.
    return (isinstance(mod, nn.Dense) and method_name == "__call__"
            and args and hasattr(args[0], "ndim") and args[0].ndim == 2)


def _is_conv1d_call(mod, method_name: str, args) -> bool:
    # 1D (NWC) conv inputs — the ASR trunk's MaskConv1d (models/jasper.py)
    # and the (1,)-kernel nn.Conv CTC head. Recorded for the dedicated
    # jasper_int8 pipeline; the generic 2D quantizer never swaps these.
    from ..models.jasper import MaskConv1d
    return (isinstance(mod, (MaskConv1d, nn.Conv))
            and method_name == "__call__"
            and args and hasattr(args[0], "ndim") and args[0].ndim == 3)


def _quantizable(mod, method_name: str, args) -> bool:
    # Calibration records every conv input; only dense (group=1) convs are
    # *swapped* to int8 by the generic quantizer — grouped/depthwise convs
    # are HBM-bound with no MXU win (the dedicated ResNeXt path in
    # resnet_int8.py does quantize its grouped 3x3s).
    return _is_conv_call(mod, method_name, args) and \
        mod.feature_group_count == 1


def calibrate_int8(model, batches: Iterable, variables=None) -> Dict[str, float]:
    """Record per-conv-input abs-max over calibration batches.

    ``batches``: iterable of model inputs (or tuples of inputs). Returns
    {module_path: amax}. The pass runs jitted — the interceptor collects
    traced maxima as extra outputs.
    """
    variables = variables if variables is not None else model.variables

    def calib_fn(variables, *args):
        rec: Dict[str, Any] = {}

        def ic(next_fn, a, k, ctx):
            mod = ctx.module
            if _is_conv_call(mod, ctx.method_name, a) or \
                    _is_dense_call(mod, ctx.method_name, a) or \
                    _is_conv1d_call(mod, ctx.method_name, a):
                path = "/".join(str(p) for p in mod.path)
                amax = jnp.max(jnp.abs(a[0].astype(jnp.float32)))
                prev = rec.get(path)
                rec[path] = amax if prev is None else jnp.maximum(prev, amax)
            return next_fn(*a, **k)

        with nn.intercept_methods(ic):
            model.module.apply(variables, *args, train=False)
        return rec

    jfn = jax.jit(calib_fn)
    scales: Dict[str, float] = {}
    for batch in batches:
        args = batch if isinstance(batch, tuple) else (batch,)
        rec = jfn(variables, *args)
        for path, amax in rec.items():
            scales[path] = max(scales.get(path, 0.0), float(amax))
    return scales


def _int8_conv(mod: nn.Conv, x, amax: float):
    kernel = mod.variables["params"]["kernel"].astype(jnp.float32)
    s_w = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(kernel / s_w), -127, 127).astype(jnp.int8)
    s_x = max(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / s_x)),
                  -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, wq,
        window_strides=_pair(mod.strides),
        padding=_lax_padding(mod.padding, mod.kernel_size),
        rhs_dilation=_pair(mod.kernel_dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * (s_w * s_x)
    if mod.use_bias:
        out = out + mod.variables["params"]["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def int8_apply_fn(model, scales: Dict[str, float]) -> Callable:
    """Jittable ``(variables, *inputs) -> outputs`` running calibrated
    convs on the int8 MXU path."""

    def fn(variables, *args):
        def ic(next_fn, a, k, ctx):
            mod = ctx.module
            if _quantizable(mod, ctx.method_name, a):
                amax = scales.get("/".join(str(p) for p in mod.path))
                if amax:
                    return _int8_conv(mod, a[0], amax)
            return next_fn(*a, **k)

        with nn.intercept_methods(ic):
            return model.module.apply(variables, *args, train=False)

    return fn


def quantize_model(model, calib_batches: Optional[Sequence] = None,
                   rng: int = 0, n_calib: int = 2, batch: int = 8):
    """One-call PTQ: calibrate (random batches if none given) and return
    ``(apply_fn, scales)``; ``apply_fn(variables, x)`` is jittable.

    Default calibration draws from the *deployment input domain*: random
    uint8 pixels pushed through ImageNet normalization for 3-channel image
    models (the domain every zoo preprocess emits, roughly [-2.1, 2.6] —
    uniform [0, 1) draws would mis-scale every layer's amax by ~2.6x),
    standard-normal inputs otherwise. Pass real ``calib_batches`` (e.g.
    batches pushed through the serving preprocess closure, as
    ``serve._calibrate`` does) for deployment-grade scales."""
    if calib_batches is None:
        key = jax.random.PRNGKey(rng)
        calib_batches = []
        for i in range(n_calib):
            key, sub = jax.random.split(key)
            x = model.dummy_input(batch)
            if isinstance(x, tuple):
                raise ValueError("multi-input models need explicit "
                                 "calib_batches")
            if x.ndim == 4 and x.shape[-1] == 3:
                u8 = jax.random.randint(sub, x.shape, 0, 256, jnp.int32)
                mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
                std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
                calib_batches.append(
                    (u8.astype(jnp.float32) / 255.0 - mean) / std)
            else:
                calib_batches.append(
                    jax.random.normal(sub, x.shape, jnp.float32))
    scales = calibrate_int8(model, calib_batches)
    return int8_apply_fn(model, scales), scales
