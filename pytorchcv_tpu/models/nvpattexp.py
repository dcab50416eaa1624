"""Neural Voice Puppetry Audio-to-Expression, TPU-native (JAX/flax).

Behavioral reference: pytorchcv ``models/nvpattexp.py``
(NvpAttExpEncoder:14, NvpAttExp:116, get_nvpattexp:174) from 'Neural Voice
Puppetry: Audio-driven Facial Reenactment' https://arxiv.org/abs/1912.05566.

Inputs: (B, seq=8, W=16, F=29) DeepSpeech windows + person id (B,).
Outputs: attention-fused and center-frame blendshape vectors (B, 76).
The per-person decoder is a SelectableDense — a gather of (O, I) matrices
followed by one batched MXU matmul."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import ConvBlock, ConvBlock1d, DenseBlock, SelectableDense, \
    Sequential, lambda_leakyrelu, lambda_tanh
from .registry import register_model

__all__ = ["NvpAttExp", "get_nvpattexp"]


class NvpAttExpEncoder(nn.Module):
    """Audio-to-expression encoder (reference nvpattexp.py:14)."""

    audio_features: int = 29
    audio_window_size: int = 16
    seq_len: int = 8
    encoder_features: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv_channels = (32, 32, 64, 64)
        conv_slopes = (0.02, 0.02, 0.2, 0.2)
        fc_channels = (128, 64, self.encoder_features)
        fc_slopes = (0.02, 0.02, None)
        att_conv_channels = (16, 8, 4, 2, 1)

        batch = x.shape[0]
        bs = batch * self.seq_len
        # (B, S, W, F) -> (B*S, W, 1, F): features as channels
        x = x.reshape(bs, self.audio_window_size, self.audio_features)
        x = x[:, :, None, :]
        x = Sequential(layers=tuple(
            ConvBlock(out_channels=oc, kernel_size=(3, 1), stride=(2, 1),
                      padding=(1, 0), bias=True, normalization=None,
                      activation=lambda_leakyrelu(slope),
                      name=f"conv{i + 1}", parent=None)
            for i, (oc, slope) in enumerate(zip(conv_channels,
                                                conv_slopes))),
            name="conv_branch")(x, train=train)
        x = x.reshape(bs, 1, -1)
        x = Sequential(layers=tuple(
            DenseBlock(out_features=oc, bias=True, normalization=None,
                       activation=(lambda_leakyrelu(slope)
                                   if slope is not None else lambda_tanh()),
                       name=f"fc{i + 1}", parent=None)
            for i, (oc, slope) in enumerate(zip(fc_channels, fc_slopes))),
            name="fc_branch")(x, train=train)
        x = x.reshape(batch, self.seq_len, -1)  # NWC: (B, S, E)
        y = x[:, self.seq_len // 2, :]
        w = Sequential(layers=tuple(
            ConvBlock1d(out_channels=oc, kernel_size=3, stride=1,
                        padding=1, bias=True, normalization=None,
                        activation=lambda_leakyrelu(0.02),
                        name=f"att_conv{i + 1}", parent=None)
            for i, oc in enumerate(att_conv_channels)),
            name="att_conv_branch")(x, train=train)
        w = w.reshape(batch, self.seq_len)
        w = DenseBlock(out_features=self.seq_len, bias=True,
                       normalization=None, activation=None,
                       name="att_fc")(w, train=train)
        w = jax.nn.softmax(w, axis=1)
        x = jnp.einsum("bse,bs->be", x, w)
        return x, y


class NvpAttExp(nn.Module):
    """NVP audio-to-expression net (reference nvpattexp.py:116)."""

    audio_features: int = 29
    audio_window_size: int = 16
    seq_len: int = 8
    base_persons: int = 116
    blendshapes: int = 76
    encoder_features: int = 32
    in_size: Tuple[int, int] = (16, 29)

    def dummy_inputs(self, batch: int = 1):
        return (jnp.zeros((batch, self.seq_len, self.audio_window_size,
                           self.audio_features), jnp.float32),
                jnp.zeros((batch,), jnp.int32))

    @nn.compact
    def __call__(self, x, pid, train: bool = False):
        x, y = NvpAttExpEncoder(
            audio_features=self.audio_features,
            audio_window_size=self.audio_window_size,
            seq_len=self.seq_len,
            encoder_features=self.encoder_features, name="encoder")(
                x, train=train)
        decoder = SelectableDense(in_features=self.encoder_features,
                                  out_features=self.blendshapes,
                                  bias=False,
                                  num_options=self.base_persons,
                                  name="decoder")
        return decoder(x, pid), decoder(y, pid)


def get_nvpattexp(base_persons: int, blendshapes: int,
                  **kwargs) -> NvpAttExp:
    """Config expander (reference nvpattexp.py:174)."""
    return NvpAttExp(base_persons=base_persons, blendshapes=blendshapes,
                     **kwargs)


@register_model("nvpattexp116bazel76")
def nvpattexp116bazel76(**kwargs):
    return get_nvpattexp(base_persons=116, blendshapes=76, **kwargs)
