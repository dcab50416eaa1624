"""ProPainter video inpainting generator, TPU-native (JAX/flax).

Behavioral reference: pytorchcv ``models/propainter.py`` (Encoder:19,
PPDecoderUnit:112, Decoder:151, SoftSplit:196, SoftComp:248,
window_partition:302, SparseWindowAttention:335, FusionFeedForward:518,
TemporalSparseTransformer:584, TemporalSparseTransformerBlock:649,
ProPainter:703, get_propainter:812) from 'ProPainter: Improving
Propagation and Transformer for Video Inpainting'
https://arxiv.org/pdf/2309.03897.

TPU-first redesign of the sparse attention: the reference loops over batch
items and partitions windows into masked (full spatio-temporal attention
incl. rolled + pooled tokens) vs unmasked (window-local attention) sets
with ragged gathers. Here BOTH attention paths are computed densely for
every window — batched (windows x heads) MXU matmuls with static shapes —
and the per-window mask selects between them. Identical outputs, no
host-side raggedness, and the "wasted" local-path FLOPs are a tiny
fraction of the full-path cost. Soft split/composite (unfold/fold) are 49
static strided slice/scatter-adds that XLA fuses."""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import (InterpolationBlock, Sequential, conv3x3, conv3x3_block,
                  interpolate, lambda_leakyrelu, lambda_tanh, max_pool2d)
from ..nn.arch import IndexedSeq
from ..nn.base import dense_kernel_init
from .propainter_ip import BidirectionalPropagation
from .registry import register_model

__all__ = ["ProPainter", "get_propainter"]


def unfold_nhwc(x, kernel_size, stride, padding):
    """torch F.unfold: (B, H, W, C) -> (B, L, C*kh*kw) with torch's
    (c, ki, kj) channel-major ordering."""
    kh, kw = kernel_size
    sh, sw = stride
    ph, pw = padding
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    fh = (h + 2 * ph - kh) // sh + 1
    fw = (w + 2 * pw - kw) // sw + 1
    taps = []
    for ki in range(kh):
        for kj in range(kw):
            taps.append(jax.lax.slice(
                xp, (0, ki, kj, 0),
                (b, ki + (fh - 1) * sh + 1, kj + (fw - 1) * sw + 1, c),
                (1, sh, sw, 1)))
    patches = jnp.stack(taps, axis=3)          # (B, fh, fw, k2, C)
    patches = patches.transpose(0, 1, 2, 4, 3)  # (B, fh, fw, C, k2)
    return patches.reshape(b, fh * fw, c * kh * kw)


def fold_nhwc(x, output_size, kernel_size, stride, padding):
    """torch F.fold: (B, L, C*kh*kw) -> (B, H, W, C) scatter-add."""
    kh, kw = kernel_size
    sh, sw = stride
    ph, pw = padding
    h, w = output_size
    b, n, ck2 = x.shape
    c = ck2 // (kh * kw)
    fh = (h + 2 * ph - kh) // sh + 1
    fw = (w + 2 * pw - kw) // sw + 1
    x = x.reshape(b, fh, fw, c, kh, kw)
    out = jnp.zeros((b, h + 2 * ph, w + 2 * pw, c), x.dtype)
    # strided scatter-add via at[]
    for ki in range(kh):
        for kj in range(kw):
            out = out.at[:, ki: ki + (fh - 1) * sh + 1: sh,
                         kj: kj + (fw - 1) * sw + 1: sw, :].add(
                x[:, :, :, :, ki, kj])
    return out[:, ph: ph + h, pw: pw + w, :]


class Encoder(nn.Module):
    """Group-interleaved encoder (reference propainter.py:19)."""

    activation: Any = lambda_leakyrelu(0.2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        group = [1, 2, 4, 8, 1]
        cfg = [(64, 2, 1), (64, 1, 1), (128, 2, 1), (256, 1, 1),
               (384, 1, 1), (512, 1, 2), (384, 1, 4), (256, 1, 8),
               (128, 1, 1)]
        layers = IndexedSeq(layers=tuple(
            conv3x3_block(out_channels=oc, stride=st, groups=g, bias=True,
                          normalization=None, activation=self.activation,
                          name=str(i), parent=None)
            for i, (oc, st, g) in enumerate(cfg)), name="layers")
        out = x
        x0 = None
        for i in range(len(cfg)):
            if i == 4:
                x0 = out
            if i > 4:
                g = group[i - 4]
                b, h, w, _ = out.shape
                y = x0.reshape(b, h, w, g, -1)
                o = out.reshape(b, h, w, g, -1)
                out = jnp.concatenate([y, o], axis=-1).reshape(b, h, w, -1)
            out = layers(out, i, train=train)
        return out


class PPDecoderUnit(nn.Module):
    """2x up + two conv blocks (reference propainter.py:112)."""

    out_channels: int = 0
    activation: Any = lambda_leakyrelu(0.2)
    final_activation: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = InterpolationBlock(scale_factor=2)(x)
        in_channels = x.shape[-1]
        x = conv3x3_block(out_channels=in_channels, bias=True,
                          normalization=None, activation=self.activation,
                          name="conv1")(x, train=train)
        return conv3x3_block(out_channels=self.out_channels, bias=True,
                             normalization=None,
                             activation=self.final_activation,
                             name="conv2")(x, train=train)


class Decoder(nn.Module):
    """Two decoder units (reference propainter.py:151)."""

    mid_channels: int = 64
    out_channels: int = 3
    activation: Any = lambda_leakyrelu(0.2)
    final_activation: Any = lambda_tanh()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = PPDecoderUnit(out_channels=self.mid_channels,
                          activation=self.activation,
                          final_activation=self.activation, name="unit1")(
                              x, train=train)
        return PPDecoderUnit(out_channels=self.out_channels,
                             activation=self.activation,
                             final_activation=self.final_activation,
                             name="unit2")(x, train=train)


class _DenseAsConv(nn.Module):
    """Params identical to ``nn.Dense(features)`` over unfolded patches
    (kernel (C*kh*kw, features) in torch unfold's channel-major (c, ki,
    kj) row order), but applied as ONE strided conv: unfold+Dense IS a
    (kh, kw) conv. Measured v5e, 19 frames at (60,108,128)->512: the
    unfold+matmul formulation paid 31 ms of gather/relayout; the conv
    is MXU-direct."""

    features: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int]
    padding: Tuple[int, int]

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param("kernel", dense_kernel_init,
                            (cin * kh * kw, self.features))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,))
        kc = kernel.reshape(cin, kh, kw, self.features).transpose(
            1, 2, 0, 3).astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x, kc, window_strides=self.stride,
            padding=[(self.padding[0],) * 2, (self.padding[1],) * 2],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(x.dtype)


class SoftSplit(nn.Module):
    """Unfold + token embedding (reference propainter.py:196), computed
    as one strided conv (see _DenseAsConv)."""

    hidden_dim: int = 512
    kernel_size: Tuple[int, int] = (7, 7)
    stride: Tuple[int, int] = (3, 3)
    padding: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, x, batch: int, output_size: Tuple[int, int],
                 train: bool = False):
        del train, output_size
        x = _DenseAsConv(features=self.hidden_dim,
                         kernel_size=self.kernel_size, stride=self.stride,
                         padding=self.padding, name="embedding")(x)
        f_h, f_w = x.shape[1], x.shape[2]
        return x.reshape(batch, -1, f_h, f_w, x.shape[-1])


class _DenseFoldAsConvT(nn.Module):
    """Params identical to ``nn.Dense(kh*kw*channels)`` whose output is
    torch-folded (overlap-add), but computed as ONE stride-1 conv over
    the token grid producing (sh*sw*channels) phase channels followed by
    depth-to-space: Dense+fold IS a stride-(sh,sw) conv transpose, and
    the phase decomposition expresses it without ``lhs_dilation``
    (measured: the lhs-dilated emission silently DROPS interior taps at
    fw>=36 on both the TPU and CPU backends — tap kj=2 vanished at
    (60,108); the phase form is exact everywhere and MXU-direct). The
    Dense bias folds to a static per-pixel tap-count map times the
    bias — a tiny einsum. Measured v5e (19 fr, 512 -> (60,108,128)):
    fold-as-49-scatter-adds paid ~31 ms of relayout."""

    channels: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int]
    padding: Tuple[int, int]

    @nn.compact
    def __call__(self, tok, output_size: Tuple[int, int]):
        kh, kw = self.kernel_size
        sh, sw = self.stride
        ph, pw = self.padding
        assert ph % sh == 0 and pw % sw == 0, \
            "phase decomposition assumes stride-aligned padding"
        h, w = output_size
        c = self.channels
        hid = tok.shape[-1]
        b, fh, fw = tok.shape[0], tok.shape[1], tok.shape[2]
        kernel = self.param("kernel", dense_kernel_init,
                            (hid, kh * kw * c))
        bias = self.param("bias", nn.initializers.zeros, (kh * kw * c,))
        dh, dw = -(-kh // sh), -(-kw // sw)      # token taps per phase
        w4 = kernel.reshape(hid, c, kh, kw).astype(tok.dtype)
        kp = jnp.zeros((dh, dw, hid, sh * sw * c), tok.dtype)
        # output pixel u = sh*(q + e) - ph + ry  (tap t_y = ry + sh*e):
        # phase (ry, rx) of u, token-grid conv tap (dy, dx) = (dh-1-e, .)
        for ry in range(sh):
            for rx in range(sw):
                base = (ry * sw + rx) * c
                for dy in range(dh):
                    ty = ry + sh * (dh - 1 - dy)
                    if ty >= kh:
                        continue
                    for dx in range(dw):
                        tx = rx + sw * (dw - 1 - dx)
                        if tx >= kw:
                            continue
                        kp = kp.at[dy, dx, :, base:base + c].set(
                            w4[:, :, ty, tx])
        mh, mw = -(-h // sh), -(-w // sw)
        pl_h = dh - 1 - ph // sh
        pl_w = dw - 1 - pw // sw
        pr_h = (mh - 1) + (dh - 1) - pl_h - (fh - 1)
        pr_w = (mw - 1) + (dw - 1) - pl_w - (fw - 1)
        out = jax.lax.conv_general_dilated(
            tok, kp, window_strides=(1, 1),
            padding=[(pl_h, pr_h), (pl_w, pr_w)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = out.reshape(b, mh, mw, sh, sw, c)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, mh * sh, mw * sw, c)[:, :h, :w]
        # folded Dense bias = (static tap-coverage counts) @ bias
        def counts(size, k, s, p, f):
            m = np.zeros((size, k), np.float32)
            for t in range(k):
                for q in range(f):
                    u = q * s - p + t
                    if 0 <= u < size:
                        m[u, t] += 1.0
            return jnp.asarray(m)
        cy = counts(h, kh, sh, ph, fh)
        cx = counts(w, kw, sw, pw, fw)
        b3 = bias.reshape(c, kh, kw)
        bias_map = jnp.einsum("yt,xs,cts->yxc", cy, cx,
                              b3.astype(jnp.float32))
        return out + bias_map.astype(tok.dtype)


class SoftComp(nn.Module):
    """Token de-embedding + fold + bias conv (reference
    propainter.py:248), computed as one transposed conv (see
    _DenseFoldAsConvT)."""

    channels: int = 128
    kernel_size: Tuple[int, int] = (7, 7)
    stride: Tuple[int, int] = (3, 3)
    padding: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, x, time: int, output_size: Tuple[int, int],
                 train: bool = False):
        del train
        batch = x.shape[0]
        fh, fw = x.shape[-3], x.shape[-2]
        x = x.reshape(batch * time, fh, fw, x.shape[-1])
        y = _DenseFoldAsConvT(channels=self.channels,
                              kernel_size=self.kernel_size,
                              stride=self.stride, padding=self.padding,
                              name="embedding")(x, output_size)
        return conv3x3(out_channels=self.channels, bias=True,
                       name="bias_conv")(y)


def window_partition(x, window_size, num_heads):
    """(B, T, H, W, C) -> (B, nWh*nWw, heads, T, wh*ww, c_head)
    (reference propainter.py:302)."""
    b, t, h, w, c = x.shape
    wh, ww = window_size
    x = x.reshape(b, t, h // wh, wh, w // ww, ww, num_heads,
                  c // num_heads)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
    return x.reshape(b, (h // wh) * (w // ww), num_heads, t, wh * ww,
                     c // num_heads)


class SparseWindowAttention(nn.Module):
    """Dual-path dense formulation of the reference's sparse window
    attention (reference propainter.py:335) — see module docstring."""

    dim: int = 512
    num_heads: int = 4
    window_size: Tuple[int, int] = (5, 9)
    pool_size: Tuple[int, int] = (4, 4)
    pooling_token: bool = True

    @nn.compact
    def __call__(self, x, mask, time_idx=None, train: bool = False):
        b, t, h, w, c = x.shape
        wh, ww = self.window_size
        c_head = c // self.num_heads
        n_wh = math.ceil(h / wh)
        n_ww = math.ceil(w / ww)
        new_h, new_w = n_wh * wh, n_ww * ww
        pad_r, pad_b = new_w - w, new_h - h
        if pad_r > 0 or pad_b > 0:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_b), (0, pad_r),
                            (0, 0)))
            mask = jnp.pad(mask, ((0, 0), (0, 0), (0, pad_b), (0, pad_r),
                                  (0, 0)))

        query = nn.Dense(c, kernel_init=dense_kernel_init, name="query")
        key = nn.Dense(c, kernel_init=dense_kernel_init, name="key")
        value = nn.Dense(c, kernel_init=dense_kernel_init, name="value")
        q, k, v = query(x), key(x), value(x)
        nw = n_wh * n_ww
        win_q = window_partition(q, self.window_size, self.num_heads)
        win_k = window_partition(k, self.window_size, self.num_heads)
        win_v = window_partition(v, self.window_size, self.num_heads)

        expand_size = tuple((i + 1) // 2 for i in self.window_size)
        ks = [win_k]
        vs = [win_v]
        if any(i > 0 for i in expand_size):
            # static valid-token indices for the 4 rolled copies
            def make_mask(fill):
                m = np.ones((wh, ww), np.float32)
                m[fill] = 0
                return m
            e0, e1 = expand_size
            m_tl = make_mask((slice(None, -e0), slice(None, -e1)))
            m_tr = make_mask((slice(None, -e0), slice(e1, None)))
            m_bl = make_mask((slice(e0, None), slice(None, -e1)))
            m_br = make_mask((slice(e0, None), slice(e1, None)))
            valid_ind = np.nonzero(
                np.stack([m_tl, m_tr, m_bl, m_br], 0).reshape(-1))[0]
            rolled = []
            for sy, sx in ((-e0, -e1), (-e0, e1), (e0, -e1), (e0, e1)):
                rk = jnp.roll(k, (sy, sx), axis=(2, 3))
                rv = jnp.roll(v, (sy, sx), axis=(2, 3))
                rolled.append((window_partition(rk, self.window_size,
                                                self.num_heads),
                               window_partition(rv, self.window_size,
                                                self.num_heads)))
            rool_k = jnp.concatenate([r[0] for r in rolled], axis=4)
            rool_v = jnp.concatenate([r[1] for r in rolled], axis=4)
            ks.append(rool_k[:, :, :, :, valid_ind])
            vs.append(rool_v[:, :, :, :, valid_ind])
        if self.pooling_token:
            from ..nn.conv import _conv2d
            pool_layer = _conv2d(c, self.pool_size, stride=self.pool_size,
                                 padding=0, groups=c, bias=True,
                                 name="pool_layer")
            px = pool_layer(x.reshape(b * t, new_h, new_w, c))
            ph, pw = px.shape[1], px.shape[2]
            px = px.reshape(b, t, ph, pw, c)

            def to_win(a):
                a = a.reshape(b, t, ph * pw, self.num_heads, c_head)
                a = a.transpose(0, 3, 1, 2, 4)      # (b, heads, t, p, ch)
                return jnp.broadcast_to(
                    a[:, None], (b, nw, self.num_heads, t, ph * pw,
                                 c_head))

            ks.append(to_win(key(px)))
            vs.append(to_win(value(px)))
        win_k_all = jnp.concatenate(ks, axis=4)
        win_v_all = jnp.concatenate(vs, axis=4)

        # window mask: any masked pixel in any local frame
        l_t = mask.shape[1]
        mpool = max_pool2d(kernel_size=self.window_size,
                           stride=self.window_size, padding=0)(
            mask.reshape(b * l_t, new_h, new_w, 1))
        mpool = mpool.reshape(b, l_t, nw)
        win_masked = jnp.sum(mpool, axis=1) > 0         # (B, nW)

        scale = 1.0 / math.sqrt(c_head)

        # full path (masked windows): q over all t, kv over (sub)sampled t
        if time_idx is not None:
            k_full = win_k_all[:, :, :, time_idx].reshape(
                b, nw, self.num_heads, -1, c_head)
            v_full = win_v_all[:, :, :, time_idx].reshape(
                b, nw, self.num_heads, -1, c_head)
        else:
            k_full = win_k_all.reshape(b, nw, self.num_heads, -1, c_head)
            v_full = win_v_all.reshape(b, nw, self.num_heads, -1, c_head)
        q_full = win_q.reshape(b, nw, self.num_heads, t * wh * ww, c_head)
        att = jnp.einsum("bwhqc,bwhkc->bwhqk", q_full, k_full) * scale
        att = jax.nn.softmax(att, axis=-1)
        y_full = jnp.einsum("bwhqk,bwhkc->bwhqc", att, v_full)
        y_full = y_full.reshape(b, nw, self.num_heads, t, wh * ww, c_head)

        # local path (unmasked windows): per-frame window-local attention
        att_s = jnp.einsum("bwhtqc,bwhtkc->bwhtqk", win_q, win_k) * scale
        att_s = jax.nn.softmax(att_s, axis=-1)
        y_local = jnp.einsum("bwhtqk,bwhtkc->bwhtqc", att_s, win_v)

        sel = win_masked[:, :, None, None, None, None]
        out = jnp.where(sel, y_full, y_local)

        out = out.reshape(b, n_wh, n_ww, self.num_heads, t, wh, ww, c_head)
        out = out.transpose(0, 4, 1, 5, 2, 6, 3, 7).reshape(
            b, t, new_h, new_w, c)
        if pad_r > 0 or pad_b > 0:
            out = out[:, :, :h, :w, :]
        return nn.Dense(c, kernel_init=dense_kernel_init, name="proj")(out)


def _fold_counts_np(output_size, kernel_size, stride, padding):
    """Per-pixel patch-coverage counts of torch fold (== fold(ones));
    static given the geometry."""
    kh, kw = kernel_size
    sh, sw = stride
    ph, pw = padding
    h, w = output_size
    fh = (h + 2 * ph - kh) // sh + 1
    fw = (w + 2 * pw - kw) // sw + 1
    canvas = np.zeros((h + 2 * ph, w + 2 * pw), np.float32)
    for qy in range(fh):
        for qx in range(fw):
            canvas[qy * sh:qy * sh + kh, qx * sw:qx * sw + kw] += 1.0
    return canvas[ph:ph + h, pw:pw + w]


class FusionFeedForward(nn.Module):
    """MLP with fold/unfold token fusion (reference propainter.py:518)."""

    dim: int = 512
    hidden_dim: int = 1960
    kernel_size: Tuple[int, int] = (7, 7)
    stride: Tuple[int, int] = (3, 3)
    padding: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, x, output_size: Tuple[int, int],
                 train: bool = False):
        del train
        n_vecs = 1
        for i, d in enumerate(self.kernel_size):
            n_vecs *= (output_size[i] + 2 * self.padding[i] - d) // \
                self.stride[i] + 1
        x = Sequential(layers=(
            nn.Dense(self.hidden_dim, kernel_init=dense_kernel_init,
                     name="0", parent=None),
        ), name="fc1")(x)
        b, n, c = x.shape
        # overlap normalizer = fold(ones): a STATIC per-pixel tap-count
        # map — computed in numpy at trace time, not scatter-added on
        # device every call
        inv_norm = jnp.asarray(
            1.0 / _fold_counts_np(output_size, self.kernel_size,
                                  self.stride, self.padding),
            x.dtype)[None, :, :, None]
        folded = fold_nhwc(x.reshape(-1, n_vecs, c), output_size,
                           self.kernel_size, self.stride, self.padding)
        y = unfold_nhwc(folded * inv_norm, self.kernel_size, self.stride,
                        self.padding)
        y = y.reshape(b, n, c)
        y = nn.gelu(y, approximate=False)
        return Sequential(layers=(
            nn.Dense(self.dim, kernel_init=dense_kernel_init, name="1",
                     parent=None),
        ), name="fc2")(y)


class TemporalSparseTransformer(nn.Module):
    """Pre-norm attention + fusion FFN (reference propainter.py:584)."""

    dim: int = 512
    num_heads: int = 4
    window_size: Tuple[int, int] = (5, 9)
    pool_size: Tuple[int, int] = (4, 4)
    kernel_size: Tuple[int, int] = (7, 7)
    stride: Tuple[int, int] = (3, 3)
    padding: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, x, fold_x_size, mask, time_idx=None,
                 train: bool = False):
        b, t, h, w, c = x.shape
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)  # torch eps
        y = SparseWindowAttention(
            dim=self.dim, num_heads=self.num_heads,
            window_size=self.window_size, pool_size=self.pool_size,
            name="attention")(y, mask, time_idx, train=train)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = y.reshape(b, t * h * w, c)
        y = FusionFeedForward(dim=self.dim, hidden_dim=1960,
                              kernel_size=self.kernel_size,
                              stride=self.stride, padding=self.padding,
                              name="mlp")(y, fold_x_size, train=train)
        return x + y.reshape(b, t, h, w, c)


class TemporalSparseTransformerBlock(nn.Module):
    """Depth-stacked transformer with dilated time sampling (reference
    propainter.py:649)."""

    dim: int = 512
    num_heads: int = 4
    window_size: Tuple[int, int] = (5, 9)
    pool_size: Tuple[int, int] = (4, 4)
    kernel_size: Tuple[int, int] = (7, 7)
    stride: Tuple[int, int] = (3, 3)
    padding: Tuple[int, int] = (3, 3)
    depth: int = 8

    @nn.compact
    def __call__(self, x, fold_x_size, l_mask, time_dilation: int = 2,
                 train: bool = False):
        assert self.depth % time_dilation == 0
        t = x.shape[1]
        time_idx = [np.arange(i, t, time_dilation)
                    for i in range(time_dilation)] * \
            (self.depth // time_dilation)
        blocks = IndexedSeq(layers=tuple(
            TemporalSparseTransformer(
                dim=self.dim, num_heads=self.num_heads,
                window_size=self.window_size, pool_size=self.pool_size,
                kernel_size=self.kernel_size, stride=self.stride,
                padding=self.padding, name=str(i), parent=None)
            for i in range(self.depth)), name="transformer")
        for i in range(self.depth):
            x = blocks(x, i, fold_x_size=fold_x_size, mask=l_mask,
                       time_idx=jnp.asarray(time_idx[i]), train=train)
        return x


class ProPainter(nn.Module):
    """ProPainter generator (reference propainter.py:703).

    ``__call__(masked_frames (B,T,H,W,3), masks_updated (B,T,H,W,1),
    masks_in (B,T,H,W,1), completed_flows (B,T-1?,H,W,4),
    num_local_frames)`` -> inpainted local frames
    (B, l_t, H, W, 3) in eval (all T in train)."""

    channels: int = 128
    hidden_dim: int = 512
    num_heads: int = 4
    depth: int = 8
    t2t_kernel_size: Tuple[int, int] = (7, 7)
    t2t_padding: Tuple[int, int] = (3, 3)
    t2t_stride: Tuple[int, int] = (3, 3)
    window_size: Tuple[int, int] = (5, 9)
    pool_size: Tuple[int, int] = (4, 4)
    in_size: Tuple[int, int] = (240, 432)

    def dummy_inputs(self, batch: int = 1):
        h, w = self.in_size
        t, l_t = 6, 4
        del l_t  # __call__ default num_local_frames=4 matches
        return (jnp.zeros((batch, t, h, w, 3), jnp.float32),
                jnp.zeros((batch, t, h, w, 1), jnp.float32),
                jnp.zeros((batch, t, h, w, 1), jnp.float32),
                jnp.zeros((batch, 3, h, w, 4), jnp.float32))

    @nn.compact
    def __call__(self, masked_frames, masks_updated, masks_in,
                 completed_flows, num_local_frames: int = 4,
                 interpolation: str = "bilinear", time_dilation: int = 2,
                 train: bool = False):
        activation = lambda_leakyrelu(0.2)
        l_t = num_local_frames
        b, t, orig_h, orig_w, _ = masked_frames.shape
        flows_f = completed_flows[..., :2]
        flows_b = completed_flows[..., 2:]

        enc_in = jnp.concatenate(
            [masked_frames.reshape(b * t, orig_h, orig_w, 3),
             masks_in.reshape(b * t, orig_h, orig_w, 1),
             masks_updated.reshape(b * t, orig_h, orig_w, 1)], axis=-1)
        enc_feat = Encoder(activation=activation, name="encoder")(
            enc_in, train=train)
        _, height, width, channels = enc_feat.shape
        enc_feat = enc_feat.reshape(b, t, height, width, channels)
        local_feat = enc_feat[:, :l_t]
        ref_feat = enc_feat[:, l_t:]
        fold_feat_size = (height, width)

        def ds_flow(f):
            ff = f.reshape(-1, orig_h, orig_w, 2)
            ff = interpolate(ff, (orig_h // 4, orig_w // 4),
                             mode="bilinear", align_corners=False)
            return ff.reshape(b, l_t - 1, height, width, 2) / 4.0

        ds_flows_f = ds_flow(flows_f)
        ds_flows_b = ds_flow(flows_b)

        def ds_mask(m, tt):
            mm = m.reshape(-1, orig_h, orig_w, 1)
            mm = interpolate(mm, (orig_h // 4, orig_w // 4), mode="nearest")
            return mm.reshape(b, tt, height, width, 1)

        ds_mask_in = ds_mask(masks_in, t)
        ds_mask_in_local = ds_mask_in[:, :l_t]
        ds_mask_updated_local = ds_mask(masks_updated[:, :l_t], l_t)

        # eval path: mask pool over local frames only (reference:700)
        mask_pool_l = max_pool2d(kernel_size=self.t2t_kernel_size,
                                 stride=self.t2t_stride,
                                 padding=self.t2t_padding)(
            ds_mask_in_local.reshape(-1, height, width, 1))
        mask_pool_l = mask_pool_l.reshape(b, l_t, mask_pool_l.shape[1],
                                          mask_pool_l.shape[2], 1)

        prop_mask_in = jnp.concatenate(
            [ds_mask_in_local, ds_mask_updated_local], axis=-1)
        _, _, local_feat, _ = BidirectionalPropagation(
            channels=self.channels, learnable=True,
            name="feat_prop_module")(
                local_feat, ds_flows_f, ds_flows_b, prop_mask_in,
                interpolation=interpolation, train=train)
        enc_feat = jnp.concatenate([local_feat, ref_feat], axis=1)

        trans_feat = SoftSplit(
            hidden_dim=self.hidden_dim, kernel_size=self.t2t_kernel_size,
            stride=self.t2t_stride, padding=self.t2t_padding, name="ss")(
                enc_feat.reshape(-1, height, width, channels), b,
                fold_feat_size, train=train)
        trans_feat = TemporalSparseTransformerBlock(
            dim=self.hidden_dim, num_heads=self.num_heads,
            window_size=self.window_size, pool_size=self.pool_size,
            kernel_size=self.t2t_kernel_size, stride=self.t2t_stride,
            padding=self.t2t_padding, depth=self.depth,
            name="transformers")(trans_feat, fold_feat_size, mask_pool_l,
                                 time_dilation=time_dilation, train=train)
        trans_feat = SoftComp(
            channels=channels, kernel_size=self.t2t_kernel_size,
            stride=self.t2t_stride, padding=self.t2t_padding, name="sc")(
                trans_feat, t, fold_feat_size, train=train)
        trans_feat = trans_feat.reshape(b, t, height, width, channels)
        enc_feat = enc_feat + trans_feat

        output = Decoder(mid_channels=64, out_channels=3,
                         activation=activation,
                         final_activation=lambda_tanh(), name="decoder")(
            enc_feat[:, :l_t].reshape(-1, height, width, channels),
            train=train)
        return output.reshape(b, l_t, orig_h, orig_w, 3)


def get_propainter(**kwargs) -> ProPainter:
    """Config expander (reference propainter.py:812)."""
    return ProPainter(**kwargs)


@register_model("propainter")
def propainter(**kwargs):
    return get_propainter(**kwargs)
