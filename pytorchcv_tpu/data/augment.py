"""Device-side batched training augmentation (jit-compiled, static shapes).

TPU-first counterpart of the torchvision training transforms the reference
ecosystem uses (RandomResizedCrop / RandomHorizontalFlip / pad-and-crop —
host-side PIL, one image at a time). Here the whole batch is one jitted
program: per-sample randomness comes from vmapped PRNG keys, crops resolve
to ``dynamic_slice`` (CIFAR pad-crop) or to per-sample
``scale_and_translate`` interpolation matmuls (ImageNet resized-crop) so
everything keeps static shapes and rides the MXU/VPU instead of the host.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..kernels.preprocess import IMAGENET_MEAN, IMAGENET_STD

__all__ = ["random_crop_flip", "random_resized_crop", "train_augment"]


def _flip_lr(x, flip):
    return jnp.where(flip, x[:, ::-1, :], x)


@functools.partial(jax.jit, static_argnames=("padding",))
def random_crop_flip(images: jax.Array, key: jax.Array,
                     padding: int = 4) -> jax.Array:
    """CIFAR-style augmentation: reflect-pad by ``padding``, per-sample
    random crop back to the original size, per-sample horizontal flip.

    images: (N, H, W, C) float or uint8; returns the same shape/dtype.
    """
    n, h, w, _ = images.shape
    pad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    padded = jnp.pad(images, pad, mode="reflect")
    k_off, k_flip = jax.random.split(key)
    offs = jax.random.randint(k_off, (n, 2), 0, 2 * padding + 1)
    flips = jax.random.bernoulli(k_flip, 0.5, (n,))

    def one(img, off, flip):
        crop = jax.lax.dynamic_slice(
            img, (off[0], off[1], 0), (h, w, img.shape[-1]))
        return _flip_lr(crop, flip)

    return jax.vmap(one)(padded, offs, flips)


def _sample_boxes(key, n, in_hw, scale, ratio):
    """Per-sample (y0, x0, ch, cw) crop boxes, torchvision's
    RandomResizedCrop distribution (area-uniform scale, log-uniform
    ratio), clamped to the image instead of retry-looped (static shapes:
    the 10-try/fallback host loop is replaced by clamping — same support,
    slightly different tail distribution). When a side clips, the other
    side is recomputed from the *sampled* ratio (then clamped again), so
    the realized aspect ratio only departs from the draw when no box of
    that ratio fits the image at all — matching the spirit of
    torchvision's center-fallback instead of silently distorting."""
    h, w = in_hw
    k_s, k_r, k_y, k_x = jax.random.split(key, 4)
    area = h * w * jax.random.uniform(k_s, (n,), minval=scale[0],
                                      maxval=scale[1])
    log_r = jax.random.uniform(k_r, (n,), minval=jnp.log(ratio[0]),
                               maxval=jnp.log(ratio[1]))
    r = jnp.exp(log_r)
    cw = jnp.clip(jnp.sqrt(area * r), 8.0, w)
    ch = jnp.clip(cw / r, 8.0, h)       # ratio-preserving: r = cw / ch
    cw = jnp.clip(ch * r, 8.0, w)
    y0 = jax.random.uniform(k_y, (n,)) * (h - ch)
    x0 = jax.random.uniform(k_x, (n,)) * (w - cw)
    return y0, x0, ch, cw


@functools.partial(jax.jit, static_argnames=("out_size", "scale", "ratio"))
def random_resized_crop(images: jax.Array, key: jax.Array,
                        out_size: Tuple[int, int] = (224, 224),
                        scale: Tuple[float, float] = (0.08, 1.0),
                        ratio: Tuple[float, float] = (0.75, 4.0 / 3.0),
                        ) -> jax.Array:
    """ImageNet-style RandomResizedCrop: per-sample random box -> bilinear
    resize to ``out_size``. The resize is ``scale_and_translate`` — dense
    separable interpolation matmuls with *static* output shape; the random
    box only changes the (traced) scale/translation values, so one compiled
    program serves every draw."""
    n, h, w, _ = images.shape
    oh, ow = out_size
    y0, x0, ch, cw = _sample_boxes(key, n, (h, w), scale, ratio)
    sy = oh / ch
    sx = ow / cw

    def one(img, sy, sx, y0, x0):
        return jax.image.scale_and_translate(
            img.astype(jnp.float32), (oh, ow, img.shape[-1]), (0, 1),
            jnp.stack([sy, sx]), jnp.stack([-y0 * sy, -x0 * sx]),
            method="linear", antialias=True)

    return jax.vmap(one)(images, sy, sx, y0, x0)


@functools.partial(jax.jit,
                   static_argnames=("out_size", "dtype", "mean", "std"))
def train_augment(images: jax.Array, key: jax.Array,
                  out_size: Tuple[int, int] = (224, 224),
                  mean: Sequence[float] = IMAGENET_MEAN,
                  std: Sequence[float] = IMAGENET_STD,
                  dtype=jnp.bfloat16) -> jax.Array:
    """The full ImageNet training chain as ONE device program:
    uint8 (N,H,W,3) -> RandomResizedCrop -> random hflip -> [0,1] ->
    normalize -> ``dtype``. Counterpart of the fused *eval* preprocess
    (kernels/preprocess.py); reference protocol: README.md:157-167."""
    k_crop, k_flip = jax.random.split(key)
    x = random_resized_crop(images, k_crop, out_size)
    flips = jax.random.bernoulli(k_flip, 0.5, (images.shape[0],))
    x = jax.vmap(_flip_lr)(x, flips)
    x = x / 255.0 if images.dtype == jnp.uint8 else x
    m = jnp.asarray(mean, jnp.float32)
    s = jnp.asarray(std, jnp.float32)
    return ((x - m) / s).astype(dtype)
