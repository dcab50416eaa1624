"""Fused on-device ImageNet eval preprocessing (north-star requirement).

The reference's eval protocol (reference README.md:157-167) is the
TorchVision PIL stack: resize the short side to ``round(img_size / scale)``
with PIL-bilinear (antialiased), center-crop ``img_size``, convert to float
and normalize with the ImageNet mean/std. The README explicitly warns that
accuracy is resize-implementation sensitive, so this module reproduces
PIL's adaptive triangle filter exactly — not ``jax.image.resize``.

TPU-native formulation: a separable resize with *static* shapes is two
dense interpolation matmuls — ``out = R @ img @ C^T`` with R:(out_h, in_h),
C:(out_w, in_w) — which ride the MXU instead of gather units. The center
crop folds into R/C by slicing their rows, and the uint8->float conversion
plus normalization fold into the kernel epilogue, so the whole pipeline is
one Pallas kernel per (image, channel): HBM is read once (uint8) and
written once (bf16).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["IMAGENET_MEAN", "IMAGENET_STD", "CIFAR_MEAN", "CIFAR_STD",
           "resize_matrices", "eval_protocol", "preprocess_batch",
           "classification_preprocess", "segmentation_preprocess"]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
# Standard CIFAR-10 statistics (the reference's CIFAR/SVHN training stack;
# its eval protocol is ToTensor+Normalize only — no resize, no crop).
CIFAR_MEAN = (0.4914, 0.4822, 0.4465)
CIFAR_STD = (0.2023, 0.1994, 0.2010)


def _pil_bilinear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) row-stochastic PIL-bilinear filter matrix.

    Mirrors Pillow's ``precompute_coeffs`` (triangle filter, support 1.0,
    widened by the scale ratio when downscaling, weights renormalized).
    """
    m = np.zeros((out_size, in_size), np.float64)
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 1.0 * filterscale
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        js = np.arange(xmin, xmax)
        w = 1.0 - np.abs((js + 0.5 - center) / filterscale)
        w = np.clip(w, 0.0, None)
        s = w.sum()
        if s > 0:
            m[i, xmin:xmax] = w / s
        else:
            m[i, min(int(center), in_size - 1)] = 1.0
    return m.astype(np.float32)


def resize_matrices(in_hw: Tuple[int, int], crop_size: Union[int, Tuple[int, int]],
                    scale: float = 0.875) -> Tuple[np.ndarray, np.ndarray]:
    """Interpolation matrices (R, C) implementing resize-short-side +
    center-crop for a static input size.

    ``R``: (crop_h, in_h); ``C``: (crop_w, in_w). Torch semantics:
    ``Resize(round(crop / scale))`` scales the SHORT side and keeps aspect;
    ``CenterCrop(crop)`` then slices the middle — realized here by slicing
    rows of the full interpolation matrices.
    """
    in_h, in_w = in_hw
    if isinstance(crop_size, int):
        crop_h = crop_w = crop_size
    else:
        crop_h, crop_w = crop_size
    resize_value = int(round(crop_h / scale))
    # torchvision Resize truncates the long side: int(size * long / short)
    # (_compute_resized_output_size) — int(round(...)) can drift the crop
    # window by 1px, which the reference README flags as accuracy-sensitive.
    if in_h <= in_w:
        rh = resize_value
        rw = max(int(in_w * resize_value / in_h), crop_w)
    else:
        rw = resize_value
        rh = max(int(in_h * resize_value / in_w), crop_h)
    full_r = _pil_bilinear_matrix(in_h, rh)
    full_c = _pil_bilinear_matrix(in_w, rw)
    top = (rh - crop_h) // 2
    left = (rw - crop_w) // 2
    return full_r[top:top + crop_h], full_c[left:left + crop_w]


def _affine(mean: Sequence[float], std: Sequence[float]):
    """uint8 pixel -> normalized float: y = v * a + b per channel."""
    a = 1.0 / (255.0 * np.asarray(std, np.float32))
    b = -np.asarray(mean, np.float32) / np.asarray(std, np.float32)
    return a, b


def _preprocess_kernel(a_ref, b_ref, img_ref, r_ref, ct_ref, out_ref):
    ch = pl.program_id(1)
    # Mosaic has no direct uint8->f32 cast; widen via int32.
    x = img_ref[0, 0].astype(jnp.int32).astype(jnp.float32)
    t = jnp.dot(r_ref[:], x, preferred_element_type=jnp.float32)
    y = jnp.dot(t, ct_ref[:], preferred_element_type=jnp.float32)
    out_ref[0, 0] = (y * a_ref[ch] + b_ref[ch]).astype(out_ref.dtype)


def _preprocess_pallas(planar_u8, r, ct, a, b, out_dtype, interpret: bool):
    bsz, nc, in_h, in_w = planar_u8.shape
    crop_h, crop_w = r.shape[0], ct.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bsz, nc),
        in_specs=[
            pl.BlockSpec((1, 1, in_h, in_w), lambda i, j, *_: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((crop_h, in_h), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_w, crop_w), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, crop_h, crop_w),
                               lambda i, j, *_: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _preprocess_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, nc, crop_h, crop_w), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * nc * (crop_h * in_h * in_w +
                                  crop_h * in_w * crop_w),
            bytes_accessed=bsz * nc * (in_h * in_w + 2 * crop_h * crop_w),
            transcendentals=0),
    )(a, b, planar_u8, r, ct)
    return out


@functools.partial(jax.jit, static_argnames=("mean", "std", "out_dtype",
                                             "use_pallas", "interpret",
                                             "layout"))
def preprocess_batch(images, r, ct, mean: Tuple[float, ...] = IMAGENET_MEAN,
                     std: Tuple[float, ...] = IMAGENET_STD,
                     out_dtype=jnp.bfloat16, use_pallas: Optional[bool] = None,
                     interpret: bool = False, layout: str = "nhwc"):
    """Resize + center-crop + normalize a uint8 NHWC batch.

    ``images``: (B, H, W, C) uint8; ``r``: (crop_h, H) f32;
    ``ct``: (W, crop_w) f32 (the transposed column matrix). Returns
    (B, crop_h, crop_w, C) ``out_dtype`` — or, with ``layout="nchw"``,
    the planar (B, C, crop_h, crop_w) form the int8 serving pipelines
    consume natively (the per-channel interpolation math already produces
    planes, so planar emission just skips a transpose). Pallas on TPU;
    identical-math XLA einsum fallback elsewhere.
    """
    a, b = _affine(mean, std)
    a, b = jnp.asarray(a), jnp.asarray(b)
    # Auto resolves to the XLA einsum path: measured faster on v5e (the
    # Pallas path pays planar transposes; both are ~30x faster than model
    # inference, so preprocessing is never the bottleneck). Force the
    # fused kernel with use_pallas=True.
    # (A transpose-free fused NHWC kernel — interleaved rows, kron(ct,I3)
    # column matmul — was built and measured 1.56-1.63 ms batch-384 v5e:
    # per-grid-step overhead over 384 tiny matmuls dominates; strictly
    # worse than both paths below, removed. ba97b5a^ has the code.)
    if use_pallas is None:
        use_pallas = False
    if use_pallas or interpret:
        planar = jnp.transpose(images, (0, 3, 1, 2))
        out = _preprocess_pallas(planar, r, ct, a, b, out_dtype, interpret)
        if layout == "nchw":
            return out
        return jnp.transpose(out, (0, 2, 3, 1))
    x = images.astype(jnp.float32)
    t = jnp.einsum("oh,bhwc->bowc", r, x, preferred_element_type=jnp.float32)
    if layout == "nchw":
        y = jnp.einsum("bowc,wp->bcop", t, ct,
                       preferred_element_type=jnp.float32)
        return (y * a[:, None, None] + b[:, None, None]).astype(out_dtype)
    y = jnp.einsum("bowc,wp->bopc", t, ct,
                   preferred_element_type=jnp.float32)
    return (y * a + b).astype(out_dtype)


def eval_protocol(model_name: str, model_in_size=None):
    """Dataset -> eval-geometry dispatch for the classification zoo.

    The reference encodes the protocol per row in its metainfo CSV
    (model_metainfos.csv cols test_dataset/img_size/img_scale; prose in
    reference README.md:157-167): ImageNet/CUB rows evaluate with
    resize-short-side(round(size/scale)) + center-crop, while the
    CIFAR/SVHN rows (dataset 'cf', NA img_size) feed the native 32x32
    directly — ToTensor + CIFAR Normalize only, no resize, no crop.

    Returns ``(mode, crop_hw, scale, mean, std)`` with mode in
    {'resize_crop', 'direct'}. A null metainfo ``in_size`` resolves from
    ``model_in_size`` (the constructor's declared input size) — it NEVER
    defaults to 224: the 242 CIFAR/SVHN rows all carry null in_size and a
    224 default silently mis-serves every one of them.
    """
    from ..zoo.store import get_model_metainfo_dict
    info = get_model_metainfo_dict().get(model_name) or {}
    in_size = info.get("in_size")
    if in_size:
        crop_hw = (int(in_size), int(in_size))
    elif model_in_size is not None:
        if isinstance(model_in_size, int):
            crop_hw = (model_in_size, model_in_size)
        else:
            crop_hw = (int(model_in_size[0]), int(model_in_size[1]))
    else:
        raise ValueError(
            f"{model_name!r}: metainfo in_size is null — pass the model's "
            f"constructor in_size via model_in_size (never defaults to 224)")
    if info.get("dataset") == "cf":
        return ("direct", crop_hw, 1.0, CIFAR_MEAN, CIFAR_STD)
    scale = float(info.get("scale") or 0.875)
    return ("resize_crop", crop_hw, scale, IMAGENET_MEAN, IMAGENET_STD)


def classification_preprocess(model_name_or_size, in_hw: Tuple[int, int],
                              out_dtype=jnp.bfloat16,
                              use_pallas: Optional[bool] = None,
                              layout: str = "nhwc",
                              model_in_size=None):
    """Build a jitted ``batch_u8 -> model input`` closure for a zoo model.

    Given a name, dispatches the eval protocol per dataset via
    ``eval_protocol`` (reference model_metainfos.csv cols
    test_dataset/img_size/img_scale): resize+crop for ImageNet/CUB rows,
    direct-feed (PIL-bilinear resize to the native size iff the source
    differs; identity matrices otherwise) + CIFAR normalize for the
    CIFAR/SVHN rows. ``model_in_size`` supplies the constructor's input
    size for rows whose metainfo ``in_size`` is null."""
    if isinstance(model_name_or_size, str):
        mode, crop_hw, scale, mean, std = eval_protocol(
            model_name_or_size, model_in_size)
    else:
        mode, crop_hw = "resize_crop", (model_name_or_size,) * 2
        scale, mean, std = 0.875, IMAGENET_MEAN, IMAGENET_STD
    if mode == "direct":
        # Direct feed: separable PIL-bilinear straight to the native size
        # (identity matrices when in_hw == crop_hw — bit-exact passthrough
        # through the same matmul path).
        r = _pil_bilinear_matrix(in_hw[0], crop_hw[0])
        c = _pil_bilinear_matrix(in_hw[1], crop_hw[1])
    else:
        r, c = resize_matrices(in_hw, crop_hw, scale)
    r = jnp.asarray(r)
    ct = jnp.asarray(c.T)
    mean, std = tuple(mean), tuple(std)

    def run(images_u8):
        return preprocess_batch(images_u8, r, ct, mean=mean, std=std,
                                out_dtype=out_dtype,
                                use_pallas=use_pallas, layout=layout)

    return run


def segmentation_preprocess(out_hw: Tuple[int, int], in_hw: Tuple[int, int],
                            mean=IMAGENET_MEAN, std=IMAGENET_STD,
                            out_dtype=jnp.bfloat16,
                            use_pallas: Optional[bool] = None):
    """Dense-prediction input pipeline: PIL-bilinear resize straight to the
    model's fixed size (no aspect crop — the reference's seg heads take
    ``fixed_size`` ctor inputs, e.g. 480x480 VOC / 1024x2048 Cityscapes)
    + normalize, as the same two MXU interpolation matmuls."""
    r = jnp.asarray(_pil_bilinear_matrix(in_hw[0], out_hw[0]))
    ct = jnp.asarray(_pil_bilinear_matrix(in_hw[1], out_hw[1]).T)

    def run(images_u8):
        return preprocess_batch(images_u8, r, ct, mean=tuple(mean),
                                std=tuple(std), out_dtype=out_dtype,
                                use_pallas=use_pallas)

    return run
