"""Jasper/DR (and the QuartzNet base) for ASR, TPU-native. Behavioral
reference: pytorchcv ``models/jasper.py`` (outmask_fill:17, NemoAudioReader:125,
NemoMelSpecExtractor:193, CtcDecoder:302, MaskConv1d:375, MaskConvBlock1d:441,
DwsConvBlock1d:604, JasperUnit:694, JasperFinalBlock:777, Jasper:850,
get_jasper:979).

TPU-first design:
  * layout is NWC (batch, time, channels); convs are 1D MXU matmuls.
  * variable-length audio is handled by STATIC shapes + length masking
    (SURVEY §7 hard-part 3): ``outmask_fill`` is a broadcasted-iota compare,
    mask positions are recomputed per conv — no dynamic shapes under jit.
  * the mel front-end (preemphasis, framed rFFT, Slaney mel filterbank,
    masked normalization) is pure jnp, fused by XLA into one program.
"""

from __future__ import annotations

import math
from typing import Any, Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn import BatchNorm
from ..nn.base import Composed, conv_kernel_init
from .registry import register_model

__all__ = ["Jasper", "get_jasper", "CtcDecoder", "NemoMelSpecExtractor",
           "AudioReader", "batch_waveforms", "outmask_fill",
           "masked_normalize2"]


class AudioReader:
    """Audio-file ingestion (reference NemoAudioReader, jasper.py:125-190):
    read audio files into mono float32 arrays at a target sample rate.

    Uses ``soundfile`` when importable (any libsndfile format); otherwise
    falls back to the stdlib ``wave`` module (PCM 8/16/24/32-bit WAV).
    Rate conversion is host-side linear interpolation — adequate for the
    ASR front-end, which immediately lowpasses into 64 mel bands.
    """

    def __init__(self, desired_audio_sample_rate: int = 16000):
        self.desired_audio_sample_rate = desired_audio_sample_rate

    def _read_wave(self, path: str):
        import wave

        with wave.open(path, "rb") as w:
            sr = w.getframerate()
            n_ch = w.getnchannels()
            width = w.getsampwidth()
            raw = w.readframes(w.getnframes())
        if width == 1:      # unsigned 8-bit PCM
            data = (np.frombuffer(raw, np.uint8).astype(np.float32)
                    - 128.0) / 128.0
        elif width == 2:
            data = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
        elif width == 3:
            b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
            i32 = (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8)
                   | (b[:, 2].astype(np.int32) << 16))
            i32 = np.where(i32 >= 1 << 23, i32 - (1 << 24), i32)
            data = i32.astype(np.float32) / float(1 << 23)
        elif width == 4:
            data = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.
        else:
            raise ValueError(f"unsupported WAV sample width {width}")
        return data.reshape(-1, n_ch), sr

    def read_from_file(self, audio_file_path: str) -> np.ndarray:
        try:
            from soundfile import SoundFile
            with SoundFile(audio_file_path, "r") as f:
                sr = f.samplerate
                data = f.read(dtype="float32")
            if data.ndim == 1:
                data = data[:, None]
        except ImportError:
            data, sr = self._read_wave(audio_file_path)
        data = data.mean(axis=1)            # downmix to mono
        target_sr = self.desired_audio_sample_rate
        if sr != target_sr:
            n_out = int(round(len(data) * target_sr / sr))
            t_out = np.arange(n_out, dtype=np.float64) * (sr / target_sr)
            data = np.interp(t_out, np.arange(len(data)), data) \
                .astype(np.float32)
        return data

    def read_from_files(self, audio_file_paths) -> List[np.ndarray]:
        assert type(audio_file_paths) in (list, tuple)
        return [self.read_from_file(p) for p in audio_file_paths]


def batch_waveforms(waves: List[np.ndarray],
                    pad_multiple: int = 1600) -> Tuple[np.ndarray,
                                                       np.ndarray]:
    """Pad a list of mono waveforms to one static-shape ``(B, S)`` batch
    plus lengths — the input contract of the jitted ASR serving path
    (static shapes; padding masked by ``outmask_fill``). ``pad_multiple``
    buckets S to limit recompilation across batches (default 0.1 s)."""
    n = max(len(w) for w in waves)
    n = ((n + pad_multiple - 1) // pad_multiple) * pad_multiple
    out = np.zeros((len(waves), n), np.float32)
    for i, w in enumerate(waves):
        out[i, :len(w)] = w
    return out, np.asarray([len(w) for w in waves], np.int32)


def outmask_fill(x, x_len, value: float = 0.0):
    """Zero positions at/after ``x_len`` along the time axis (axis 1, NWC;
    reference jasper.py:17 uses axis 2, NCW)."""
    max_len = x.shape[1]
    mask = jnp.arange(max_len)[None, :] >= x_len[:, None]
    return jnp.where(mask[:, :, None], value, x)


def masked_normalize2(x, x_len):
    """Per-utterance masked mean/std normalization over time
    (reference jasper.py:60, scheme #2). ``x`` is (B, T, C)."""
    x = outmask_fill(x, x_len)
    denom = x_len[:, None].astype(x.dtype)
    x_mean = x.sum(axis=1) / denom
    x2_mean = jnp.square(x).sum(axis=1) / denom
    x_std = jnp.sqrt(x2_mean - jnp.square(x_mean))
    return (x - x_mean[:, None, :]) / x_std[:, None, :]


def _slaney_mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float,
                           fmax: float) -> np.ndarray:
    """librosa.filters.mel (htk=False, norm='slaney') re-derived
    (consumed at reference jasper.py:245-252)."""

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        f_sp = 200.0 / 3
        mel = f / f_sp
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(f >= min_log_hz,
                        min_log_mel + np.log(np.maximum(f, 1e-10) /
                                             min_log_hz) / logstep, mel)

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f_sp = 200.0 / 3
        freqs = f_sp * m
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(m >= min_log_mel,
                        min_log_hz * np.exp(logstep * (m - min_log_mel)),
                        freqs)

    mel_f = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax),
                                  n_mels + 2))
    fft_freqs = np.linspace(0, sr / 2.0, 1 + n_fft // 2)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2:n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)  # (n_mels, 1 + n_fft//2)


class NemoMelSpecExtractor(nn.Module):
    """NEMO-compatible log-mel front-end (reference jasper.py:193).
    Input (B, n_samples) + lengths; output (B, T, n_mels) + frame lengths."""

    sample_rate: int = 16000
    window_size_sec: float = 0.02
    window_stride_sec: float = 0.01
    n_fft: int = 512
    n_filters: int = 64
    preemph: float = 0.97
    dither: float = 0.0

    @nn.compact
    def __call__(self, x, x_len, train: bool = False):
        # Waveform math in f32 regardless of the serving dtype: bf16
        # audio is ~8-bit-relative amplitude. Features return in the
        # caller's dtype (normalized O(1) values are bf16-safe).
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        win_length = int(self.window_size_sec * self.sample_rate)
        hop_length = int(self.window_stride_sec * self.sample_rate)
        x_len = jnp.ceil(x_len.astype(jnp.float32) / hop_length).astype(
            jnp.int32)
        if self.dither > 0 and train:
            x = x + self.dither * jax.random.normal(
                self.make_rng("dropout"), x.shape, x.dtype)
        # preemphasis (reference jasper.py:262)
        x = jnp.concatenate(
            [x[:, :1], x[:, 1:] - self.preemph * x[:, :-1]], axis=1)
        # torch.stft(center=True): reflect-pad n_fft//2, hann(win, sym)
        # centered inside an n_fft window.
        pad = self.n_fft // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
        n_frames = 1 + (xp.shape[1] - self.n_fft) // hop_length
        idx = (jnp.arange(n_frames)[:, None] * hop_length +
               jnp.arange(self.n_fft)[None, :])
        frames = xp[:, idx]                       # (B, T, n_fft)
        n = np.arange(win_length)
        hann = (0.5 - 0.5 * np.cos(2 * np.pi * n / (win_length - 1)))
        wpad = (self.n_fft - win_length) // 2
        window = np.zeros((self.n_fft,), np.float32)
        window[wpad:wpad + win_length] = hann
        spec = jnp.fft.rfft(frames * window, n=self.n_fft)
        power = jnp.square(spec.real) + jnp.square(spec.imag)  # (B, T, F)
        fb = jnp.asarray(_slaney_mel_filterbank(
            self.sample_rate, self.n_fft, self.n_filters, 0.0,
            self.sample_rate / 2.0))
        mel = jnp.einsum("btf,mf->btm", power, fb)
        mel = jnp.log(mel + 2.0 ** -24)
        mel = masked_normalize2(mel, x_len)
        mel = outmask_fill(mel, x_len)
        # pad time to a multiple of 16 (reference jasper.py:276-279)
        pad_align = 16
        rem = mel.shape[1] % pad_align
        if rem != 0:
            mel = jnp.pad(mel, ((0, 0), (0, pad_align - rem), (0, 0)))
        return mel.astype(orig_dtype), x_len


class CtcDecoder:
    """Greedy CTC decode: merge repeats, drop blanks
    (reference jasper.py:302)."""

    def __init__(self, vocabulary: List[str]):
        self.blank_id = len(vocabulary)
        self.labels_map = {i: vocabulary[i] for i in range(len(vocabulary))}

    def __call__(self, predictions):
        hypotheses = []
        for prediction in predictions:
            decoded = []
            previous = self.blank_id
            for p in prediction:
                p = int(p)
                if (p != previous or previous == self.blank_id) and \
                        p != self.blank_id:
                    decoded.append(p)
                previous = p
            hypotheses.append("".join(self.labels_map[c] for c in decoded))
        return hypotheses


class MaskConv1d(nn.Module):
    """Length-masked 1D conv, NWC (reference jasper.py:375). The module
    itself holds ``kernel``/``bias`` (torch MaskConv1d IS an nn.Conv1d)."""

    out_channels: int = 0
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    bias: bool = False
    use_mask: bool = True

    @nn.compact
    def __call__(self, x, x_len):
        if self.use_mask:
            x = outmask_fill(x, x_len)
            x_len = (x_len + 2 * self.padding -
                     self.dilation * (self.kernel_size - 1) - 1) \
                // self.stride + 1
        kernel = self.param(
            "kernel", conv_kernel_init,
            (self.kernel_size, x.shape[-1] // self.groups,
             self.out_channels))
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), window_strides=(self.stride,),
            padding=((self.padding, self.padding),),
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.groups)
        if self.bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.out_channels,))
            y = y + b.astype(y.dtype)
        return y, x_len


class MaskConvBlock1d(nn.Module):
    """Masked conv + BN + ReLU + dropout (reference jasper.py:441)."""

    out_channels: int = 0
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    bn_eps: float = 1e-3
    use_bn: bool = True
    activate: bool = True
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, x_len, train: bool = False):
        x, x_len = MaskConv1d(
            out_channels=self.out_channels, kernel_size=self.kernel_size,
            stride=self.stride, padding=self.padding,
            dilation=self.dilation, groups=self.groups,
            name="conv")(x, x_len)
        if self.use_bn:
            x = BatchNorm(epsilon=self.bn_eps, name="bn")(x, train=train)
        if self.activate:
            x = nn.relu(x)
        if self.dropout_rate != 0.0 and train:
            x = nn.Dropout(rate=self.dropout_rate, deterministic=False)(x)
        return x, x_len


class DwsConvBlock1d(nn.Module):
    """Masked depthwise-separable conv block (reference jasper.py:604)."""

    out_channels: int = 0
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    bn_eps: float = 1e-3
    activate: bool = True
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, x_len, train: bool = False):
        in_channels = x.shape[-1]
        x, x_len = MaskConv1d(
            out_channels=in_channels, kernel_size=self.kernel_size,
            stride=self.stride, padding=self.padding,
            dilation=self.dilation, groups=in_channels,
            name="dw_conv")(x, x_len)
        x, x_len = MaskConv1d(out_channels=self.out_channels, kernel_size=1,
                              groups=self.groups,
                              name="pw_conv")(x, x_len)
        if self.groups > 1:
            b, w, c = x.shape
            x = x.reshape(b, w, self.groups, c // self.groups)
            x = jnp.swapaxes(x, 2, 3).reshape(b, w, c)
        x = BatchNorm(epsilon=self.bn_eps, name="bn")(x, train=train)
        if self.activate:
            x = nn.relu(x)
        if self.dropout_rate != 0.0 and train:
            x = nn.Dropout(rate=self.dropout_rate, deterministic=False)(x)
        return x, x_len


class JasperUnit(nn.Module):
    """Jasper unit with (optionally dense) residual
    (reference jasper.py:694)."""

    out_channels: int = 0
    kernel_size: int = 11
    bn_eps: float = 1e-3
    dropout_rate: float = 0.0
    repeat: int = 3
    use_dw: bool = False
    use_dr: bool = False

    @nn.compact
    def __call__(self, x, x_len, train: bool = False):
        block_class = DwsConvBlock1d if self.use_dw else MaskConvBlock1d
        if self.use_dr:
            x_len, y, y_len = x_len if isinstance(x_len, tuple) \
                else (x_len, None, None)
            y = [x] if y is None else y + [x]
            y_len = [x_len] if y_len is None else y_len + [x_len]
            identity = JasperDrIdentity(
                out_channels=self.out_channels, bn_eps=self.bn_eps,
                name="identity_block")(y, y_len, train=train)
        else:
            identity, _ = MaskConvBlock1d(
                out_channels=self.out_channels, kernel_size=1,
                bn_eps=self.bn_eps, activate=False,
                name="identity_block")(x, x_len, train=train)
        cur_len = x_len
        x, cur_len = JasperBody(
            out_channels=self.out_channels, kernel_size=self.kernel_size,
            bn_eps=self.bn_eps, dropout_rate=self.dropout_rate,
            repeat=self.repeat, use_dw=self.use_dw,
            name="body")(x, cur_len, train=train)
        x = nn.relu(x + identity)
        if self.dropout_rate != 0.0 and train:
            x = nn.Dropout(rate=self.dropout_rate, deterministic=False)(x)
        if self.use_dr:
            return x, (cur_len, y, y_len)
        return x, cur_len


class JasperDrIdentity(nn.Module):
    """Dense-residual identity: per-source 1x1 blocks summed (torch
    DualPathParallelConcurent, reference jasper.py:380-388 + :415-420)."""

    out_channels: int = 0
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, ys, y_lens, train: bool = False):
        identity = None
        for i, (yi, yi_len) in enumerate(zip(ys, y_lens)):
            zi, _ = MaskConvBlock1d(
                out_channels=self.out_channels, kernel_size=1,
                bn_eps=self.bn_eps, activate=False,
                name=f"block{i + 1}")(yi, yi_len, train=train)
            identity = zi if identity is None else identity + zi
        return identity


class JasperBody(nn.Module):
    """The unit's repeated conv stack (torch ``body`` DualPathSequential,
    reference jasper.py:396-409)."""

    out_channels: int = 0
    kernel_size: int = 11
    bn_eps: float = 1e-3
    dropout_rate: float = 0.0
    repeat: int = 3
    use_dw: bool = False

    @nn.compact
    def __call__(self, x, x_len, train: bool = False):
        block_class = DwsConvBlock1d if self.use_dw else MaskConvBlock1d
        for i in range(self.repeat):
            last = (i == self.repeat - 1)
            x, x_len = block_class(
                out_channels=self.out_channels,
                kernel_size=self.kernel_size, stride=1,
                padding=self.kernel_size // 2, bn_eps=self.bn_eps,
                activate=not last,
                dropout_rate=(0.0 if last else self.dropout_rate),
                name=f"block{i + 1}")(x, x_len, train=train)
        return x, x_len


class JasperFinalBlock(nn.Module):
    """Final dilated + wide blocks (reference jasper.py:777)."""

    channels: Tuple = ()
    kernel_sizes: Tuple = ()
    bn_eps: float = 1e-3
    dropout_rates: Tuple = ()
    use_dw: bool = False
    use_dr: bool = False

    @nn.compact
    def __call__(self, x, x_len, train: bool = False):
        if self.use_dr:
            x_len = x_len[0]
        conv1_class = DwsConvBlock1d if self.use_dw else MaskConvBlock1d
        x, x_len = conv1_class(
            out_channels=self.channels[-2],
            kernel_size=self.kernel_sizes[-2], stride=1,
            padding=(2 * self.kernel_sizes[-2] // 2 - 1), dilation=2,
            bn_eps=self.bn_eps, dropout_rate=self.dropout_rates[-2],
            name="conv1")(x, x_len, train=train)
        x, x_len = MaskConvBlock1d(
            out_channels=self.channels[-1],
            kernel_size=self.kernel_sizes[-1], stride=1,
            padding=self.kernel_sizes[-1] // 2, bn_eps=self.bn_eps,
            dropout_rate=self.dropout_rates[-1],
            name="conv2")(x, x_len, train=train)
        return x, x_len


class Jasper(Composed):
    """Jasper/DR/QuartzNet (reference jasper.py:850). Returns
    (logits (B, T, num_classes+blank? no — num_classes), lengths) or decoded
    text when ``return_text``."""

    channels: Any = None
    kernel_sizes: Any = None
    bn_eps: float = 1e-3
    dropout_rates: Any = None
    repeat: int = 3
    use_dw: bool = False
    use_dr: bool = False
    from_audio: bool = True
    dither: float = 0.0
    return_text: bool = False
    vocabulary: Any = None
    in_channels: int = 64
    num_classes: int = 29

    def dummy_inputs(self, batch: int = 1):
        """Example (audio, lengths) for shape tracing."""
        if self.from_audio:
            n = 16000
            return (jnp.zeros((batch, n), jnp.float32),
                    jnp.full((batch,), n, jnp.int32))
        return (jnp.zeros((batch, 128, self.in_channels), jnp.float32),
                jnp.full((batch,), 128, jnp.int32))

    @nn.compact
    def __call__(self, x, x_len=None, train: bool = False):
        if x_len is None:
            x, x_len = x
        if self.from_audio:
            x, x_len = NemoMelSpecExtractor(
                dither=self.dither, name="preprocessor")(x, x_len,
                                                         train=train)
        x, x_len = JasperFeatures(
            channels=tuple(self.channels),
            kernel_sizes=tuple(self.kernel_sizes), bn_eps=self.bn_eps,
            dropout_rates=tuple(self.dropout_rates), repeat=self.repeat,
            use_dw=self.use_dw, use_dr=self.use_dr,
            name="features")(x, x_len, train=train)
        x = nn.Conv(self.num_classes, (1,), use_bias=True,
                    kernel_init=conv_kernel_init, name="output")(x)
        if self.return_text:
            preds = jnp.argmax(x, axis=-1)
            return CtcDecoder(self.vocabulary)(np.asarray(preds))
        return x, x_len


class JasperFeatures(nn.Module):
    """The full feature trunk (torch ``features`` DualPathSequential,
    reference jasper.py:906-940)."""

    channels: Tuple = ()
    kernel_sizes: Tuple = ()
    bn_eps: float = 1e-3
    dropout_rates: Tuple = ()
    repeat: int = 3
    use_dw: bool = False
    use_dr: bool = False

    @nn.compact
    def __call__(self, x, x_len, train: bool = False):
        init_class = DwsConvBlock1d if self.use_dw else MaskConvBlock1d
        x, x_len = init_class(
            out_channels=self.channels[0],
            kernel_size=self.kernel_sizes[0], stride=2,
            padding=self.kernel_sizes[0] // 2, bn_eps=self.bn_eps,
            dropout_rate=self.dropout_rates[0],
            name="init_block")(x, x_len, train=train)
        for i, (oc, ks, dr) in enumerate(zip(
                self.channels[1:-2], self.kernel_sizes[1:-2],
                self.dropout_rates[1:-2])):
            x, x_len = JasperUnit(
                out_channels=oc, kernel_size=ks, bn_eps=self.bn_eps,
                dropout_rate=dr, repeat=self.repeat, use_dw=self.use_dw,
                use_dr=self.use_dr,
                name=f"unit{i + 1}")(x, x_len, train=train)
        x, x_len = JasperFinalBlock(
            channels=self.channels, kernel_sizes=self.kernel_sizes,
            bn_eps=self.bn_eps, dropout_rates=self.dropout_rates,
            use_dw=self.use_dw, use_dr=self.use_dr,
            name="final_block")(x, x_len, train=train)
        return x, x_len


def get_jasper(version: Tuple[str, str], use_dw: bool = False,
               use_dr: bool = False, bn_eps: float = 1e-3,
               vocabulary=None, **kwargs):
    """Config expander (reference jasper.py:979)."""
    blocks, repeat = tuple(map(int, version[1].split("x")))
    main_stage_repeat = blocks // 5
    model_type = version[0]
    if model_type == "jasper":
        channels_per_stage = [256, 256, 384, 512, 640, 768, 896, 1024]
        kernel_sizes_per_stage = [11, 11, 13, 17, 21, 25, 29, 1]
        dropout_rates_per_stage = [0.2, 0.2, 0.2, 0.2, 0.3, 0.3, 0.4, 0.4]
    elif model_type == "quartznet":
        channels_per_stage = [256, 256, 256, 512, 512, 512, 512, 1024]
        kernel_sizes_per_stage = [33, 33, 39, 51, 63, 75, 87, 1]
        dropout_rates_per_stage = [0.0] * 8
    else:
        raise ValueError(f"Unsupported Jasper family type: {model_type}")
    stage_repeat = [1] * 8
    for i in range(1, 6):
        stage_repeat[i] *= main_stage_repeat
    channels = sum([[a] * r for a, r in
                    zip(channels_per_stage, stage_repeat)], [])
    kernel_sizes = sum([[a] * r for a, r in
                        zip(kernel_sizes_per_stage, stage_repeat)], [])
    dropout_rates = sum([[a] * r for a, r in
                         zip(dropout_rates_per_stage, stage_repeat)], [])
    return Jasper(channels=channels, kernel_sizes=kernel_sizes,
                  bn_eps=bn_eps, dropout_rates=dropout_rates, repeat=repeat,
                  use_dw=use_dw, use_dr=use_dr, vocabulary=vocabulary,
                  **kwargs)


EN_VOCAB = list(" abcdefghijklmnopqrstuvwxyz'")


@register_model("jasper5x3")
def jasper5x3(num_classes: int = 29, **kwargs):
    return get_jasper(version=("jasper", "5x3"), vocabulary=EN_VOCAB,
                      num_classes=num_classes, **kwargs)


@register_model("jasper10x4")
def jasper10x4(num_classes: int = 29, **kwargs):
    return get_jasper(version=("jasper", "10x4"), vocabulary=EN_VOCAB,
                      num_classes=num_classes, **kwargs)


@register_model("jasper10x5")
def jasper10x5(num_classes: int = 29, **kwargs):
    return get_jasper(version=("jasper", "10x5"), vocabulary=EN_VOCAB,
                      num_classes=num_classes, **kwargs)
