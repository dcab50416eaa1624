"""RAFT optical flow, TPU-native (JAX/flax, NHWC).

Behavioral reference: pytorchcv ``models/raft.py`` (create_coords_grid:24,
upsample_flow_using_mask:63, bilinear_sampler:125, CorrCalculator:155,
RAFTEncoder:231, RAFTMotionEncoder:345, ConvGRU:432, SepConvGRU:503,
FlowHead:536, MaskHead:577, RAFTUpdateBlock:618, RAFT:715, get_raft:855) —
re-designed TPU-first:

- the all-pairs correlation volume is ONE batched matmul (MXU) instead of
  per-pixel loops; its 4-level pyramid lives as NHWC tensors of shape
  (B*H*W, H/2^i, W/2^i, 1) so the radius-window lookup is a single
  ``grid_sample`` gather per level;
- the recurrent refinement runs a FIXED number of iterations (static trip
  count). We unroll it under ``jit`` rather than ``lax.scan``: at
  ``iters``=12 the update block is small, unrolling lets XLA fuse the
  elementwise GRU arithmetic across iterations and keep layouts free,
  whereas ``scan`` would pin layouts and block cross-step fusion;
- the convex-combination upsampler is expressed as one einsum over the
  (9, 8, 8) mask factorization — no ``unfold`` materialization.

The reference quirk in CorrCalculator.__call__ (the window's row offset is
added to the *x* coordinate and the column offset to *y*; raft.py:186-194)
is reproduced exactly — the offset grids are symmetric so the sampled set
is identical, but the channel ordering of the lookup matters for converted
weights.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import (ConvBlock, Sequential, conv1x1, conv3x3, conv3x3_block,
                  conv7x7_block, grid_sample, interpolate,
                  lambda_batchnorm2d, lambda_instancenorm2d, lambda_relu,
                  lambda_sigmoid, lambda_tanh)
from ..nn.ops import avg_pool2d
from .inceptionv3 import ConvSeqBranch
from .registry import register_model
from .resnet import ResUnit

__all__ = ["RAFT", "get_raft",
           "calc_bidirectional_optical_flow_on_video_by_raft"]


def create_coords_grid(batch: int, height: int, width: int) -> jnp.ndarray:
    """Pixel coordinate grid, channels (x, y) (reference raft.py:24) —
    NHWC: (B, H, W, 2)."""
    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32),
                          indexing="ij")
    coords = jnp.stack([xs, ys], axis=-1)
    return jnp.broadcast_to(coords[None], (batch, height, width, 2))


def upsample_flow_using_mask(flow: jnp.ndarray,
                             mask: jnp.ndarray) -> jnp.ndarray:
    """Convex-combination 8x upsampling (reference raft.py:63).

    ``flow``: (B, h, w, 2); ``mask``: (B, h, w, 9*8*8) factored as
    (neighbor, up_row, up_col). One softmax + one einsum; XLA fuses the
    9-neighbor gather (static shifts of a padded copy) into it.
    """
    b, h, w, _ = flow.shape
    m = mask.reshape(b, h, w, 9, 8, 8)
    m = jax.nn.softmax(m, axis=3)
    fp = jnp.pad(8.0 * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # neighbor order = unfold's (ky, kx) row-major
    neigh = jnp.stack([fp[:, ky:ky + h, kx:kx + w]
                       for ky in range(3) for kx in range(3)], axis=3)
    up = jnp.einsum("bhwnuv,bhwnc->bhuwvc", m, neigh)
    return up.reshape(b, 8 * h, 8 * w, 2)


def upsample_flow_using_interpolation(flow: jnp.ndarray) -> jnp.ndarray:
    """8x bilinear upsampling of a flow field (reference raft.py:102)."""
    b, h, w, _ = flow.shape
    return 8.0 * interpolate(flow, (8 * h, 8 * w), mode="bilinear",
                             align_corners=True)


def build_corr_pyramid(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                       num_levels: int = 4):
    """All-pairs correlation pyramid (reference CorrCalculator.__init__:167).

    The volume is one (B, HW, HW) matmul — the MXU-shaped formulation —
    then reshaped to (B*HW, H, W, 1) and average-pooled per level.
    """
    b, h, w, c = fmap1.shape
    f1 = fmap1.reshape(b, h * w, c)
    f2 = fmap2.reshape(b, h * w, c)
    corr = jnp.einsum("bxc,byc->bxy", f1, f2) / math.sqrt(c)
    corr = corr.reshape(b * h * w, h, w, 1)
    pyramid = [corr]
    pool = avg_pool2d(kernel_size=2, stride=2)
    for _ in range(num_levels - 1):
        corr = pool(corr)
        pyramid.append(corr)
    return pyramid


def lookup_corr(pyramid, coords: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Sample (2r+1)^2 bilinear windows around ``coords`` at every pyramid
    level (reference CorrCalculator.__call__:181) — as MATMULS, not
    gathers.

    The direct port (``lookup_corr_gather`` below) grid_samples a C=1
    volume: 4 scalar gathers x 81 offsets x 4 levels x iters — the worst
    case for the TPU gather path; raft_small measured 1.7 pairs/s at
    368x768 with it. Because every window is an axis-aligned bilinear
    grid around one centroid, the sampling operator factorizes per pixel
    into (2r+1, Hl) x (Hl, Wl) x (Wl, 2r+1) banded one-hot matmuls with
    the lerp weights folded into the bands:

        Wy[k, y] = (1-wy)*[y == y0+k] + wy*[y == y0+k+1]
        Wx[j, x] = (1-wx)*[x == x0+j] + wx*[x == x0+j+1]
        window   = Wy @ corr @ Wx^T

    Out-of-range taps match no one-hot column and contribute zero —
    exactly F.grid_sample's zeros padding. Identical math, MXU-shaped.
    """
    b, h, w, _ = coords.shape
    r = radius
    ks = 2 * r + 1
    n = b * h * w
    lin = jnp.linspace(-r, r, ks, dtype=jnp.float32)
    # f32 positions: bf16 coords are ~0.25-0.5 px coarse at the 1/8-res
    # grid widths of streaming resolutions.
    centroid = coords.reshape(n, 2).astype(jnp.float32)
    outs = []
    for i, corr in enumerate(pyramid):
        hl, wl = corr.shape[1:3]
        cm = corr.reshape(n, hl, wl)
        c = centroid / (2.0 ** i)
        fx = c[:, 0, None] + lin                 # (n, ks)
        fy = c[:, 1, None] + lin
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        wx = (fx - x0)[:, :, None]
        wy = (fy - y0)[:, :, None]
        ys = jnp.arange(hl, dtype=jnp.float32)
        xs = jnp.arange(wl, dtype=jnp.float32)
        wy_m = ((1.0 - wy) * (ys == y0[:, :, None]) +
                wy * (ys == y0[:, :, None] + 1.0)).astype(cm.dtype)
        wx_m = ((1.0 - wx) * (xs == x0[:, :, None]) +
                wx * (xs == x0[:, :, None] + 1.0)).astype(cm.dtype)
        rows = jnp.einsum("nkh,nhw->nkw", wy_m, cm)      # (n, ks_y, wl)
        # output layout matches the gather port: slow axis = x offset,
        # fast axis = y offset (the reference adds delta[...,0] to x).
        win = jnp.einsum("nkw,njw->njk", rows, wx_m)     # (n, ks_x, ks_y)
        outs.append(win.reshape(b, h, w, ks * ks))
    return jnp.concatenate(outs, axis=-1)


def lookup_corr_gather(pyramid, coords: jnp.ndarray,
                       radius: int) -> jnp.ndarray:
    """Direct grid_sample port of the reference lookup — the parity
    oracle for ``lookup_corr`` (tests/test_flow_parity.py); not used in
    the serving path (scalar-gather-bound on TPU)."""
    b, h, w, _ = coords.shape
    r = radius
    lin = jnp.linspace(-r, r, 2 * r + 1, dtype=jnp.float32)
    # reference quirk: delta[...,0] (the row offset) is added to x and
    # delta[...,1] (the col offset) to y; symmetric grids make the sampled
    # set identical but fix the channel ordering.
    d0, d1 = jnp.meshgrid(lin, lin, indexing="ij")
    centroid = coords.reshape(b * h * w, 1, 1, 2)
    outs = []
    for i, corr in enumerate(pyramid):
        hl, wl = corr.shape[1:3]
        c = centroid / (2.0 ** i)
        gx = c[..., 0] + d0
        gy = c[..., 1] + d1
        grid = jnp.stack([2.0 * gx / (wl - 1) - 1.0,
                          2.0 * gy / (hl - 1) - 1.0], axis=-1)
        sampled = grid_sample(corr, grid, align_corners=True)
        outs.append(sampled.reshape(b, h, w, (2 * r + 1) ** 2))
    return jnp.concatenate(outs, axis=-1)


class RAFTEncoder(nn.Module):
    """RAFT feature/context encoder (reference raft.py:231): conv7x7/2 stem,
    three 2-unit residual stages, 1x1 projection."""

    init_block_channels: int = 64
    mid_channels: Any = ()
    final_block_channels: int = 256
    bottleneck: bool = False
    normalization: Any = lambda_batchnorm2d()
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        layers = [conv7x7_block(out_channels=self.init_block_channels,
                                stride=2, bias=True,
                                normalization=self.normalization,
                                name="init_block", parent=None)]
        for i, channels_per_stage in enumerate(self.mid_channels):
            units = []
            for j, out_channels in enumerate(channels_per_stage):
                stride = 2 if (j == 0) and (i != 0) else 1
                units.append(ResUnit(
                    out_channels=out_channels, stride=stride, bias=True,
                    normalization=self.normalization,
                    bottleneck=self.bottleneck, conv1_stride=False,
                    final_body_activation=lambda_relu(),
                    name=f"unit{j + 1}", parent=None))
            layers.append(Sequential(layers=tuple(units),
                                     name=f"stage{i + 1}", parent=None))
        layers.append(conv1x1(out_channels=self.final_block_channels,
                              bias=True, name="final_block", parent=None))
        x = Sequential(layers=tuple(layers), name="features")(x, train=train)
        if self.dropout_rate > 0.0:
            x = nn.Dropout(rate=self.dropout_rate,
                           deterministic=not train)(x)
        return x


class RAFTMotionEncoder(nn.Module):
    """Motion encoder: conv stacks over the correlation lookup and current
    flow, fused and re-concatenated with the flow (reference raft.py:345)."""

    corr_out_channels_list: Tuple = ()
    flow_out_channels_list: Tuple = ()
    mout_out_channels: int = 126

    @nn.compact
    def __call__(self, corr, flow, train: bool = False):
        if len(self.corr_out_channels_list) == 1:
            corr_ks, corr_pd = (1,), (0,)
        else:
            corr_ks, corr_pd = (1, 3), (0, 1)
        corr1 = ConvSeqBranch(
            out_channels_list=self.corr_out_channels_list,
            kernel_size_list=corr_ks,
            strides_list=(1,) * len(corr_ks), padding_list=corr_pd,
            bias=True, normalization=None, name="conv_corr")(
                corr, train=train)
        flow1 = ConvSeqBranch(
            out_channels_list=self.flow_out_channels_list,
            kernel_size_list=(7, 3), strides_list=(1, 1),
            padding_list=(3, 1), bias=True, normalization=None,
            name="conv_flow")(flow, train=train)
        out = jnp.concatenate([corr1, flow1], axis=-1)
        out = conv3x3_block(out_channels=self.mout_out_channels, bias=True,
                            normalization=None, name="conv_out")(
                                out, train=train)
        return jnp.concatenate([out, flow], axis=-1)


class ConvGRU(nn.Module):
    """Convolutional GRU cell (reference raft.py:432)."""

    hidden_dim: int = 128
    kernel_size: Any = 3
    padding: Any = 1

    @nn.compact
    def __call__(self, h, x, train: bool = False):
        def gate(name, activation):
            return ConvBlock(out_channels=self.hidden_dim,
                             kernel_size=self.kernel_size,
                             padding=self.padding, bias=True,
                             normalization=None, activation=activation,
                             name=name)

        hx = jnp.concatenate([h, x], axis=-1)
        z = gate("conv_z", lambda_sigmoid())(hx, train=train)
        r = gate("conv_r", lambda_sigmoid())(hx, train=train)
        q = jnp.concatenate([r * h, x], axis=-1)
        q = gate("conv_q", lambda_tanh())(q, train=train)
        return (1.0 - z) * h + z * q


class SepConvGRU(nn.Module):
    """Separable GRU: a (1,5) pass then a (5,1) pass (reference
    raft.py:503)."""

    hidden_dim: int = 128

    @nn.compact
    def __call__(self, h, x, train: bool = False):
        h = ConvGRU(hidden_dim=self.hidden_dim, kernel_size=(1, 5),
                    padding=(0, 2), name="horizontal_gru")(h, x, train=train)
        h = ConvGRU(hidden_dim=self.hidden_dim, kernel_size=(5, 1),
                    padding=(2, 0), name="vertical_gru")(h, x, train=train)
        return h


class FlowHead(nn.Module):
    """conv3x3 block + raw conv3x3 (reference raft.py:536)."""

    mid_channels: int = 256
    out_channels: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.mid_channels, bias=True,
                          normalization=None, name="conv1")(x, train=train)
        return conv3x3(out_channels=self.out_channels, bias=True,
                       name="conv2")(x)


class MaskHead(nn.Module):
    """conv3x3 block + raw conv1x1 (reference raft.py:577)."""

    mid_channels: int = 256
    out_channels: int = 576

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3x3_block(out_channels=self.mid_channels, bias=True,
                          normalization=None, name="conv1")(x, train=train)
        return conv1x1(out_channels=self.out_channels, bias=True,
                       name="conv2")(x)


class RAFTUpdateBlock(nn.Module):
    """One refinement step: motion features -> GRU -> flow delta (+ optional
    upsampling mask) (reference raft.py:618)."""

    hidden_dim: int = 128
    corr_out_channels_list: Tuple = ()
    flow_out_channels_list: Tuple = ()
    mout_out_channels: int = 126
    sep_gru: bool = True
    flow_mid_channels: int = 256
    mask_out_channels: int = 576

    @nn.compact
    def __call__(self, net, inp, corr, flow, train: bool = False):
        motion_features = RAFTMotionEncoder(
            corr_out_channels_list=self.corr_out_channels_list,
            flow_out_channels_list=self.flow_out_channels_list,
            mout_out_channels=self.mout_out_channels, name="encoder")(
                corr, flow, train=train)
        inp = jnp.concatenate([inp, motion_features], axis=-1)
        gru_cls = SepConvGRU if self.sep_gru else ConvGRU
        net = gru_cls(hidden_dim=self.hidden_dim, name="gru")(
            net, inp, train=train)
        delta_flow = FlowHead(mid_channels=self.flow_mid_channels,
                              name="flow_head")(net, train=train)
        if self.mask_out_channels != 0:
            # 0.25 balances gradients vs the flow head (reference:707)
            mask = 0.25 * MaskHead(mid_channels=self.flow_mid_channels,
                                   out_channels=self.mask_out_channels,
                                   name="mask")(net, train=train)
        else:
            mask = None
        return net, mask, delta_flow


class RAFT(nn.Module):
    """RAFT (reference raft.py:715) from 'RAFT: Recurrent All-Pairs Field
    Transforms for Optical Flow' https://arxiv.org/pdf/2003.12039.

    ``__call__(image1, image2)`` -> (flow at 1/8 res, full-res flow), both
    NHWC with channels (x, y). Inputs are 0..255 RGB when
    ``in_normalize`` (default)."""

    corr_levels: int = 4
    corr_radius: int = 4
    hidden_dim: int = 128
    context_dim: int = 128
    encoder_init_block_channels: int = 64
    encoder_mid_channels: Any = ()
    fnet_final_block_channels: int = 256
    encoder_bottleneck: bool = False
    cnet_normalize: bool = True
    corr_out_channels_list: Tuple = ()
    flow_out_channels_list: Tuple = ()
    mout_out_channels: int = 126
    sep_gru: bool = True
    flow_mid_channels: int = 256
    mask_out_channels: int = 576
    in_normalize: bool = True
    dropout_rate: float = 0.0
    iters: int = 12
    in_channels: int = 3
    in_size: Tuple[int, int] = (240, 432)

    def dummy_inputs(self, batch: int = 1):
        h, w = self.in_size
        return (jnp.zeros((batch, h, w, 3), jnp.float32),
                jnp.zeros((batch, h, w, 3), jnp.float32))

    @nn.compact
    def __call__(self, image1, image2, flow_init=None, train: bool = False):
        assert image1.ndim == 4 and image1.shape == image2.shape
        if self.in_normalize:
            image1 = 2.0 * (image1 / 255.0) - 1.0
            image2 = 2.0 * (image2 / 255.0) - 1.0

        fnet = RAFTEncoder(
            init_block_channels=self.encoder_init_block_channels,
            mid_channels=self.encoder_mid_channels,
            final_block_channels=self.fnet_final_block_channels,
            bottleneck=self.encoder_bottleneck,
            normalization=lambda_instancenorm2d(),
            dropout_rate=self.dropout_rate, name="fnet")
        # both frames through the feature net as one doubled batch (MXU
        # utilization; mirrors reference RAFTEncoder.forward:330)
        fmaps = fnet(jnp.concatenate([image1, image2], axis=0), train=train)
        fmap1, fmap2 = jnp.split(fmaps, 2, axis=0)
        pyramid = build_corr_pyramid(fmap1, fmap2, self.corr_levels)

        cnet = RAFTEncoder(
            init_block_channels=self.encoder_init_block_channels,
            mid_channels=self.encoder_mid_channels,
            final_block_channels=self.hidden_dim + self.context_dim,
            bottleneck=self.encoder_bottleneck,
            normalization=(lambda_batchnorm2d() if self.cnet_normalize
                           else None),
            dropout_rate=self.dropout_rate, name="cnet")
        ctx = cnet(image1, train=train)
        net = jnp.tanh(ctx[..., :self.hidden_dim])
        inp = nn.relu(ctx[..., self.hidden_dim:])

        b = image1.shape[0]
        h8, w8 = image1.shape[1] // 8, image1.shape[2] // 8
        coords0 = create_coords_grid(b, h8, w8)
        coords1 = coords0 if flow_init is None else coords0 + flow_init

        update_block = RAFTUpdateBlock(
            hidden_dim=self.hidden_dim,
            corr_out_channels_list=self.corr_out_channels_list,
            flow_out_channels_list=self.flow_out_channels_list,
            mout_out_channels=self.mout_out_channels, sep_gru=self.sep_gru,
            flow_mid_channels=self.flow_mid_channels,
            mask_out_channels=self.mask_out_channels, name="update_block")

        # fixed-trip-count recurrence, unrolled under jit (see module doc)
        up_mask = None
        for _ in range(self.iters):
            coords1 = jax.lax.stop_gradient(coords1)
            corr = lookup_corr(pyramid, coords1, self.corr_radius)
            flow = coords1 - coords0
            net, up_mask, delta_flow = update_block(net, inp, corr, flow,
                                                    train=train)
            coords1 = coords1 + delta_flow

        flow8 = coords1 - coords0
        if up_mask is None:
            flow_up = upsample_flow_using_interpolation(flow8)
        else:
            flow_up = upsample_flow_using_mask(flow8, up_mask)
        return flow8, flow_up


def get_raft(version: str, **kwargs) -> RAFT:
    """Config expander (reference raft.py:855)."""
    if version == "basic":
        cfg = dict(
            corr_levels=4, corr_radius=4, hidden_dim=128, context_dim=128,
            encoder_init_block_channels=64,
            encoder_mid_channels=((64, 64), (96, 96), (128, 128)),
            fnet_final_block_channels=256, encoder_bottleneck=False,
            cnet_normalize=True, corr_out_channels_list=(256, 192),
            flow_out_channels_list=(128, 64), mout_out_channels=128 - 2,
            sep_gru=True, flow_mid_channels=256, mask_out_channels=64 * 9)
    elif version == "small":
        cfg = dict(
            corr_levels=4, corr_radius=3, hidden_dim=96, context_dim=64,
            encoder_init_block_channels=32,
            encoder_mid_channels=((32, 32), (64, 64), (96, 96)),
            fnet_final_block_channels=128, encoder_bottleneck=True,
            cnet_normalize=False, corr_out_channels_list=(96,),
            flow_out_channels_list=(64, 32), mout_out_channels=80,
            sep_gru=False, flow_mid_channels=128, mask_out_channels=0)
    else:
        raise ValueError(f"Unsupported RAFT version {version}")
    cfg.update(kwargs)
    return RAFT(**cfg)


@register_model("raft_things")
def raft_things(**kwargs):
    return get_raft(version="basic", **kwargs)


@register_model("raft_small")
def raft_small(**kwargs):
    return get_raft(version="small", **kwargs)


def calc_bidirectional_optical_flow_on_video_by_raft(apply_fn, frames):
    """Forward+backward flow between consecutive frames (reference
    raft.py:964). ``frames``: (T, H, W, 3); returns (T-1, H, W, 4) with
    channels (fwd_x, fwd_y, bwd_x, bwd_y)."""
    assert frames.ndim == 4 and frames.shape[0] > 1
    frames1 = frames[:-1]
    frames2 = frames[1:]
    _, flows_forward = apply_fn(frames1, frames2)
    _, flows_backward = apply_fn(frames2, frames1)
    return jnp.concatenate([flows_forward, flows_backward], axis=-1)
