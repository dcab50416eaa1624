"""SuperPointNet for HPatches (image matching), TPU-native (JAX/flax, NHWC).

Behavioral reference: pytorchcv ``models/superpointnet.py`` (SPHead:14,
SPDetector:52, SPDescriptor:149, SuperPointNet:219, get_superpointnet:296) —
re-designed for static shapes:

The reference detector runs a greedy, confidence-sorted NMS in a Python
loop and returns ragged per-image point lists — a host-side algorithm that
cannot live under ``jit``. Here detection is a fixed-shape pipeline: the
65-way softmax heatmap is depth-to-spaced to full resolution, local maxima
are found with ONE stride-1 max-pool over the (2*nms_dist+1) suppression
window, the border rule is applied as a static mask, and ``lax.top_k``
selects ``max_pts`` points. Output is (pts (B,K,2) int32 (row,col),
confs (B,K), descriptors (B,K,256), valid (B,K) bool) — padded entries
have ``valid``=False. Peak-window NMS keeps exactly the reference's points
whenever maxima are isolated (its greedy suppression can additionally
resurrect chained neighbors); the heatmap and descriptor sampling are
bit-compatible and tested for exact parity.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import Sequential, conv1x1, conv3x3_block, grid_sample, max_pool2d
from .registry import register_model

__all__ = ["SuperPointNet", "SPHead", "SPDetector", "SPDescriptor",
           "get_superpointnet"]


class SPHead(nn.Module):
    """conv3x3 block (bias, no norm) + raw conv1x1 (reference
    superpointnet.py:14)."""

    mid_channels: int = 256
    out_channels: int = 65

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.mid_channels, bias=True,
                          normalization=None, name="conv1")(x, train=train)
        return conv1x1(out_channels=self.out_channels, bias=True,
                       name="conv2")(x)


class SPDetector(nn.Module):
    """Interest-point detector (reference superpointnet.py:52), static-shape
    formulation (see module docstring)."""

    mid_channels: int = 256
    conf_thresh: float = 0.015
    nms_dist: int = 4
    border_size: int = 4
    reduction: int = 8
    max_pts: int = 500

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, _ = x.shape
        red = self.reduction
        semi = SPHead(mid_channels=self.mid_channels,
                      out_channels=red * red + 1,
                      name="detector")(x, train=train)
        dense = jax.nn.softmax(semi, axis=-1)
        nodust = dense[..., :-1]
        # depth-to-space (8, 8) -> full-resolution heatmap
        heatmap = nodust.reshape(b, h, w, red, red)
        heatmap = heatmap.transpose(0, 1, 3, 2, 4).reshape(
            b, h * red, w * red)

        img_h, img_w = h * red, w * red
        win = 2 * self.nms_dist + 1
        local_max = max_pool2d(kernel_size=win, stride=1,
                               padding=self.nms_dist)(heatmap[..., None])
        keep = (heatmap >= self.conf_thresh) & (heatmap >= local_max[..., 0])
        # border rule: keep rows/cols r with bord < r <= size - bord
        # (reference's asymmetric interval; superpointnet.py:129)
        bord = self.border_size + self.nms_dist
        rows = jnp.arange(img_h)
        cols = jnp.arange(img_w)
        keep &= ((rows > bord) & (rows <= img_h - bord))[None, :, None]
        keep &= ((cols > bord) & (cols <= img_w - bord))[None, None, :]

        scores = jnp.where(keep, heatmap, -1.0).reshape(b, img_h * img_w)
        confs, idx = jax.lax.top_k(scores, self.max_pts)
        pts = jnp.stack([idx // img_w, idx % img_w], axis=-1).astype(
            jnp.int32)
        valid = confs > 0.0
        return pts, jnp.where(valid, confs, 0.0), valid


class SPDescriptor(nn.Module):
    """Descriptor generator (reference superpointnet.py:149): L2-normalized
    coarse map, bilinearly sampled at the detected points, re-normalized."""

    mid_channels: int = 256
    descriptor_length: int = 256
    transpose_descriptors: bool = True
    reduction: int = 8

    @nn.compact
    def __call__(self, x, pts, train: bool = False):
        b, h, w, _ = x.shape
        coarse = SPHead(mid_channels=self.mid_channels,
                        out_channels=self.descriptor_length,
                        name="head")(x, train=train)
        norm = jnp.sqrt(jnp.sum(coarse ** 2, axis=-1, keepdims=True))
        coarse = coarse / jnp.maximum(norm, 1e-12)

        pts = pts.astype(jnp.float32)
        gy = pts[..., 0] / (0.5 * h * self.reduction) - 1.0
        gx = pts[..., 1] / (0.5 * w * self.reduction) - 1.0
        if self.transpose_descriptors:
            grid = jnp.stack([gx, gy], axis=-1)
        else:
            grid = jnp.stack([gy, gx], axis=-1)
        # (B, 1, K, 2) grid; torch F.grid_sample default align_corners=False
        desc = grid_sample(coarse, grid[:, None], align_corners=False)[:, 0]
        norm = jnp.sqrt(jnp.sum(desc ** 2, axis=-1, keepdims=True))
        return desc / jnp.maximum(norm, 1e-12)


class SuperPointNet(nn.Module):
    """SuperPointNet (reference superpointnet.py:219) from 'SuperPoint:
    Self-Supervised Interest Point Detection and Description'
    https://arxiv.org/abs/1712.07629.

    ``__call__(x)`` with grayscale NHWC input -> (pts (B,K,2) int32
    (row,col), confs (B,K), descriptors (B,K,256), valid (B,K))."""

    channels: Any = ()
    final_block_channels: int = 256
    transpose_descriptors: bool = True
    max_pts: int = 500
    in_channels: int = 1
    in_size: Tuple[int, int] = (224, 224)

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.shape[-1] == 1
        stages = []
        for i, channels_per_stage in enumerate(self.channels):
            units = []
            if i != 0:
                units.append(max_pool2d(kernel_size=2, stride=2))
            for j, out_channels in enumerate(channels_per_stage):
                units.append(conv3x3_block(
                    out_channels=out_channels, bias=True, normalization=None,
                    name=f"unit{j + 1}", parent=None))
            stages.append(Sequential(layers=tuple(units),
                                     name=f"stage{i + 1}", parent=None))
        x = Sequential(layers=tuple(stages), name="features")(x, train=train)
        pts, confs, valid = SPDetector(
            mid_channels=self.final_block_channels, max_pts=self.max_pts,
            name="detector")(x, train=train)
        descriptors = SPDescriptor(
            mid_channels=self.final_block_channels,
            transpose_descriptors=self.transpose_descriptors,
            name="descriptor")(x, pts, train=train)
        return pts, confs, descriptors, valid


def get_superpointnet(**kwargs) -> SuperPointNet:
    """Config expander (reference superpointnet.py:296)."""
    channels_per_layers = [64, 64, 128, 128]
    layers = [2, 2, 2, 2]
    channels = tuple(tuple([ci] * li)
                     for ci, li in zip(channels_per_layers, layers))
    return SuperPointNet(channels=channels, final_block_channels=256,
                         **kwargs)


@register_model("superpointnet")
def superpointnet(**kwargs):
    return get_superpointnet(**kwargs)
