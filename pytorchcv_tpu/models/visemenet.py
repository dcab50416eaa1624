"""VisemeNet for speech-driven facial animation, TPU-native (JAX/flax).

Behavioral reference: pytorchcv ``models/visemenet.py``
(VisemeDenseBranch:12, VisemeRnnBranch:48, VisemeNet:93, get_visemenet:185)
from 'VisemeNet: Audio-Driven Animator-Centric Speech Animation'
https://arxiv.org/abs/1805.09488.

NB: the reference feeds (batch, window, features) tensors into seq-major
``nn.LSTM`` modules, so the LSTM runs over the BATCH dimension with the
window acting as the batch — a quirk of the released weights that is
reproduced verbatim (the stage-2 sliding window also makes the output
batch = input batch - stage2_window//2 * 2 + ... as in the reference)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn import DenseBlock, Sequential
from ..nn.base import dense_kernel_init
from ..nn.rnn import LSTM
from .registry import register_model

__all__ = ["VisemeNet", "get_visemenet"]


class VisemeDenseBranch(nn.Module):
    """FC blocks + final raw FC; returns (final, penultimate) (reference
    visemenet.py:12)."""

    out_channels_list: Tuple = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Sequential(layers=tuple(
            DenseBlock(out_features=oc, bias=True, name=f"block{i + 1}",
                       parent=None)
            for i, oc in enumerate(self.out_channels_list[:-1])),
            name="branch")(x, train=train)
        y = nn.Dense(self.out_channels_list[-1],
                     kernel_init=dense_kernel_init, name="final_fc")(x)
        return y, x


class VisemeRnnBranch(nn.Module):
    """LSTM + dense head (reference visemenet.py:48)."""

    out_channels_list: Tuple = ()
    rnn_num_layers: int = 1
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = LSTM(hidden_size=self.out_channels_list[0],
                 num_layers=self.rnn_num_layers,
                 dropout_rate=self.dropout_rate, name="rnn")(
                     x, train=train)
        x = x[:, -1, :]
        y, _ = VisemeDenseBranch(
            out_channels_list=tuple(self.out_channels_list[1:]),
            name="fc_branch")(x, train=train)
        return y


class VisemeNet(nn.Module):
    """VisemeNet (reference visemenet.py:93)."""

    audio_features: int = 195
    audio_window_size: int = 8
    stage2_window_size: int = 64
    num_face_ids: int = 76
    num_landmarks: int = 76
    num_phonemes: int = 21
    num_visemes: int = 20
    dropout_rate: float = 0.5
    in_size: Tuple[int, int] = (8, 195)

    def dummy_inputs(self, batch: int = 1):
        # the stage-2 sliding window needs batch > stage2_window_size / 2
        batch = max(batch, self.stage2_window_size // 2 + 2)
        return (jnp.zeros((batch, self.audio_window_size,
                           self.audio_features), jnp.float32),
                jnp.zeros((batch, self.num_face_ids), jnp.float32))

    @nn.compact
    def __call__(self, x, pid, train: bool = False):
        stage1_rnn_hidden_size = 256
        stage1_fc_mid_channels = 256
        y = LSTM(hidden_size=stage1_rnn_hidden_size, num_layers=3,
                 dropout_rate=self.dropout_rate, name="stage1_rnn")(
                     x, train=train)
        y = y[:, -1, :]
        y = jnp.concatenate([y, pid], axis=1)
        lm, _ = VisemeDenseBranch(
            out_channels_list=(stage1_fc_mid_channels, self.num_landmarks),
            name="lm_branch")(y, train=train)
        lm = lm + pid
        ph, ph1 = VisemeDenseBranch(
            out_channels_list=(stage1_fc_mid_channels, self.num_phonemes),
            name="ph_branch")(y, train=train)
        del ph
        z = jnp.concatenate([lm, ph1], axis=1)
        z2 = jnp.concatenate([z, x[:, self.audio_window_size // 2, :]],
                             axis=1)
        n_in = z2.shape[1]
        z2 = jnp.concatenate([
            jnp.zeros((self.stage2_window_size // 2, n_in), z2.dtype), z2],
            axis=0)
        ws = self.stage2_window_size
        z = jnp.stack([
            z2[i:i + ws].reshape(self.audio_window_size,
                                 n_in * ws // self.audio_window_size)
            for i in range(z2.shape[0] - ws)], axis=0)
        cls = VisemeRnnBranch(out_channels_list=(256, 200,
                                                 self.num_visemes),
                              rnn_num_layers=1,
                              dropout_rate=self.dropout_rate,
                              name="cls_branch")(z, train=train)
        reg = VisemeRnnBranch(out_channels_list=(256, 200, 100,
                                                 self.num_visemes),
                              rnn_num_layers=3,
                              dropout_rate=self.dropout_rate,
                              name="reg_branch")(z, train=train)
        jali = VisemeRnnBranch(out_channels_list=(128, 200, 2),
                               rnn_num_layers=3,
                               dropout_rate=self.dropout_rate,
                               name="jali_branch")(z, train=train)
        return cls, reg, jali


def get_visemenet(**kwargs) -> VisemeNet:
    """Config expander (reference visemenet.py:185)."""
    return VisemeNet(**kwargs)


@register_model("visemenet20")
def visemenet20(**kwargs):
    return get_visemenet(**kwargs)
