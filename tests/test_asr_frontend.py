"""Numeric oracle for the ASR mel front-end (VERDICT r1 item 9).

The round-1 ASR front-end test was shape/finiteness-only: librosa (which
the reference uses solely to *build* the mel filterbank matrix,
jasper.py:243-250) is absent here, so nothing checked the
preemph/stft/mel/log/normalize math. This closes that hole with two
independent oracles:

1. Filterbank: an independent numpy derivation of librosa's Slaney-norm
   mel filterbank (np.interp triangles; structurally different from
   pytorchcv_tpu.models.jasper._slaney_mel_filterbank's ramp formula).
2. Full chain: the reference's own torch ops line-by-line
   (``/root/reference/pytorchcv/models/jasper.py:262-281``: preemph,
   torch.stft center=True with a centered symmetric hann, power, mel
   matmul, log(x + 2^-24), masked_normalize2, outmask_fill, pad-to-16)
   with the independently derived filterbank, compared against our jax
   NemoMelSpecExtractor on ragged-length batches.
"""

import numpy as np
import pytest

from conftest import add_reference_to_path, has_reference

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference repo not mounted")


def slaney_mel_filterbank_oracle(sr, n_fft, n_mels, fmin, fmax):
    """librosa.filters.mel(htk=False, norm='slaney') from the published
    formula, built with np.interp triangles."""
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        return np.where(f >= min_log_hz,
                        min_log_mel +
                        np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                        f / f_sp)

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        return np.where(m >= min_log_mel,
                        min_log_hz * np.exp(logstep * (m - min_log_mel)),
                        f_sp * m)

    mel_pts = mel_to_hz(np.linspace(float(hz_to_mel(fmin)),
                                    float(hz_to_mel(fmax)), n_mels + 2))
    fft_freqs = np.linspace(0, sr / 2.0, 1 + n_fft // 2)
    fb = np.zeros((n_mels, fft_freqs.size))
    for i in range(n_mels):
        fb[i] = np.interp(fft_freqs,
                          [mel_pts[i], mel_pts[i + 1], mel_pts[i + 2]],
                          [0.0, 1.0, 0.0], left=0.0, right=0.0)
        fb[i] *= 2.0 / (mel_pts[i + 2] - mel_pts[i])
    return fb.astype(np.float32)


def test_slaney_filterbank_matches_independent_derivation():
    from pytorchcv_tpu.models.jasper import _slaney_mel_filterbank
    ours = _slaney_mel_filterbank(16000, 512, 64, 0.0, 8000.0)
    oracle = slaney_mel_filterbank_oracle(16000, 512, 64, 0.0, 8000.0)
    assert ours.shape == oracle.shape == (64, 257)
    np.testing.assert_allclose(ours, oracle, atol=2e-6)
    # sanity: every filter has support, rows are triangles
    assert (oracle.sum(axis=1) > 0).all()


def _torch_oracle_chain(x_np, x_len_np, fb):
    """Reference NemoMelSpecExtractor.forward math, dither=0
    (jasper.py:262-281), with reference masked_normalize2/outmask_fill."""
    import torch

    add_reference_to_path()
    from pytorchcv.models.jasper import masked_normalize2, outmask_fill

    sr, win, hop, n_fft = 16000, 320, 160, 512
    x = torch.from_numpy(x_np.astype(np.float32))
    x_len = torch.ceil(torch.from_numpy(
        x_len_np.astype(np.float32)) / hop).long()

    x = torch.cat((x[:, :1], x[:, 1:] - 0.97 * x[:, :-1]), dim=1)
    window = torch.hann_window(win, periodic=False).float()
    spec = torch.stft(x, n_fft=n_fft, hop_length=hop, win_length=win,
                      window=window, center=True, return_complex=True)
    power = spec.abs().pow(2)                        # (B, F, T)
    mel = torch.matmul(torch.from_numpy(fb), power)  # (B, M, T)
    mel = torch.log(mel + 2.0 ** -24)
    mel = masked_normalize2(mel, x_len)
    mel = outmask_fill(mel, x_len)
    pad_rem = mel.size(-1) % 16
    if pad_rem != 0:
        mel = torch.nn.functional.pad(mel, pad=(0, 16 - pad_rem))
    return mel.numpy(), x_len.numpy()


def test_mel_frontend_matches_torch_oracle():
    import torch

    import jax.numpy as jnp
    from pytorchcv_tpu.models.jasper import NemoMelSpecExtractor

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    n = int(16000 * 1.21)
    x = (rng.randn(2, n) * 0.1).astype(np.float32)
    x_len = np.array([n, int(n * 0.63)], np.int64)
    # zero the padded tail like a real ragged batch
    x[1, x_len[1]:] = 0.0

    fb = slaney_mel_filterbank_oracle(16000, 512, 64, 0.0, 8000.0)
    want, want_len = _torch_oracle_chain(x, x_len, fb)

    mod = NemoMelSpecExtractor()
    got, got_len = mod.apply({}, jnp.asarray(x), jnp.asarray(x_len),
                             train=False)
    got = np.asarray(got).transpose(0, 2, 1)        # (B,T,M) -> (B,M,T)

    np.testing.assert_array_equal(np.asarray(got_len), want_len)
    assert got.shape == want.shape, (got.shape, want.shape)
    scale = np.abs(want).max() + 1e-9
    err = np.abs(got - want).max() / scale
    assert err < 2e-5, f"mel front-end rel err {err:.2e}"
