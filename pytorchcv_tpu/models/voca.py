"""VOCA speech-driven facial animation, TPU-native (JAX/flax).

Behavioral reference: pytorchcv ``models/voca.py`` (VocaEncoder:14,
VOCA:103, get_voca:170) from 'Capture, Learning, and Synthesis of 3D
Speaking Styles' https://arxiv.org/abs/1905.03079.

Inputs: DeepSpeech audio window (B, W=16, F=29, 1) NHWC + speaker id
(B,) int. Output: (B, 1, vertices, 3) FLAME mesh offsets."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import BatchNorm, ConvBlock, Sequential
from ..nn.base import dense_kernel_init
from .registry import register_model

__all__ = ["VOCA", "get_voca"]


class VocaEncoder(nn.Module):
    """VOCA encoder (reference voca.py:14): audio-feature conv stack over
    the time axis, conditioned on a one-hot speaker embedding."""

    audio_features: int = 29
    audio_window_size: int = 16
    base_persons: int = 8
    encoder_features: int = 50

    @nn.compact
    def __call__(self, x, pid, train: bool = False):
        channels = (32, 32, 64, 64)
        fc1_channels = 128
        x = BatchNorm(name="bn")(x, train=train)
        # features -> channels: (B, W, F, 1) -> (B, W, 1, F)
        x = x.transpose(0, 1, 3, 2)
        y = jnp.broadcast_to(pid[:, None, None, :],
                             (x.shape[0], self.audio_window_size, 1,
                              pid.shape[-1]))
        x = jnp.concatenate([x, y], axis=-1)
        branch = Sequential(layers=tuple(
            ConvBlock(out_channels=oc, kernel_size=(3, 1), stride=(2, 1),
                      padding=(1, 0), bias=True, normalization=None,
                      name=f"conv{i + 1}", parent=None)
            for i, oc in enumerate(channels)), name="branch")
        x = branch(x, train=train)
        x = x.reshape(x.shape[0], -1)
        x = jnp.concatenate([x, pid], axis=1)
        x = nn.Dense(fc1_channels, kernel_init=dense_kernel_init,
                     name="fc1")(x)
        x = jnp.tanh(x)
        return nn.Dense(self.encoder_features,
                        kernel_init=dense_kernel_init, name="fc2")(x)


class VOCA(nn.Module):
    """VOCA (reference voca.py:103)."""

    audio_features: int = 29
    audio_window_size: int = 16
    base_persons: int = 8
    encoder_features: int = 50
    vertices: int = 5023
    in_size: Tuple[int, int] = (16, 29)

    def dummy_inputs(self, batch: int = 1):
        return (jnp.zeros((batch, self.audio_window_size,
                           self.audio_features, 1), jnp.float32),
                jnp.zeros((batch,), jnp.int32))

    @nn.compact
    def __call__(self, x, pid, train: bool = False):
        pid = jax.nn.one_hot(pid.astype(jnp.int32), self.base_persons,
                             dtype=x.dtype)
        x = VocaEncoder(audio_features=self.audio_features,
                        audio_window_size=self.audio_window_size,
                        base_persons=self.base_persons,
                        encoder_features=self.encoder_features,
                        name="encoder")(x, pid, train=train)
        x = nn.Dense(3 * self.vertices, kernel_init=dense_kernel_init,
                     name="decoder")(x)
        return x.reshape(x.shape[0], 1, -1, 3)


def get_voca(base_persons: int, vertices: int, **kwargs) -> VOCA:
    """Config expander (reference voca.py:170)."""
    return VOCA(base_persons=base_persons, vertices=vertices, **kwargs)


@register_model("voca8flame")
def voca8flame(**kwargs):
    return get_voca(base_persons=8, vertices=5023, **kwargs)
