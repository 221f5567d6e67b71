"""Log-mel spectrogram front-end for the speaker encoder.

Parameter-for-parameter port of the behavior in
/root/reference/src/models/onnx.rs:167-320: 24 kHz input, n_fft 1024,
hop 256, 128 Slaney-normalized mel bands, fmin 0 / fmax 12 kHz, reflect
padding of (n_fft - hop)/2 on each side (note: NOT the librosa n_fft/2 pad),
periodic Hann window, magnitude = sqrt(|X|^2 + 1e-9), then log(max(mel, 1e-5)).

The filterbank is built once on host (numpy); framing + FFT + projection run
in jnp so the whole voice-cloning path is jittable on TPU.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def _hz_to_mel(freq: np.ndarray) -> np.ndarray:
    """Slaney mel scale."""
    freq = np.asarray(freq, np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    safe = np.maximum(freq, 1e-10)
    return np.where(freq >= min_log_hz,
                    min_log_mel + np.log(safe / min_log_hz) / logstep,
                    freq / f_sp)


def _mel_to_hz(mel: np.ndarray) -> np.ndarray:
    mel = np.asarray(mel, np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(mel >= min_log_mel,
                    min_log_hz * np.exp(logstep * (mel - min_log_mel)),
                    f_sp * mel)


@lru_cache(maxsize=4)
def mel_filterbank(sample_rate: int = 24000, n_fft: int = 1024,
                   n_mels: int = 128, fmin: float = 0.0,
                   fmax: float = 12000.0) -> np.ndarray:
    """Slaney-normalized triangular filterbank [n_mels, n_fft//2 + 1] (f32)."""
    n_bins = n_fft // 2 + 1
    mel_edges = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax),
                                       n_mels + 2))
    fft_freqs = np.arange(n_bins) * sample_rate / n_fft
    fb = np.zeros((n_mels, n_bins), np.float64)
    for m in range(n_mels):
        f_left, f_center, f_right = mel_edges[m], mel_edges[m + 1], mel_edges[m + 2]
        norm = 2.0 / (f_right - f_left)
        up = (fft_freqs - f_left) / (f_center - f_left)
        down = (f_right - fft_freqs) / (f_right - f_center)
        weight = np.where(
            (fft_freqs >= f_left) & (fft_freqs <= f_center), up,
            np.where((fft_freqs > f_center) & (fft_freqs <= f_right), down, 0.0))
        fb[m] = weight * norm
    return fb.astype(np.float32)


def hann_window(n_fft: int) -> np.ndarray:
    """Periodic Hann (matches the reference's 1 - cos(2*pi*i/N) form)."""
    i = np.arange(n_fft, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * i / n_fft))).astype(np.float32)


def log_mel(audio: jnp.ndarray, sample_rate: int = 24000, n_fft: int = 1024,
            hop_length: int = 256, n_mels: int = 128, fmin: float = 0.0,
            fmax: float = 12000.0) -> jnp.ndarray:
    """audio float32 [T] (or [B, T]) -> log-mel [frames, n_mels] ([B, F, M])."""
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    pad = (n_fft - hop_length) // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")

    t = x.shape[-1]
    n_frames = (t - n_fft) // hop_length + 1
    starts = np.arange(n_frames) * hop_length
    idx = starts[:, None] + np.arange(n_fft)[None, :]          # [F, n_fft]
    frames = x[:, idx]                                         # [B, F, n_fft]
    frames = frames * jnp.asarray(hann_window(n_fft))

    spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
    mag = jnp.sqrt(jnp.abs(spec) ** 2 + 1e-9)                  # [B, F, bins]

    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax))
    mels = jnp.einsum("bfk,mk->bfm", mag, fb,
                      preferred_element_type=jnp.float32)
    out = jnp.log(jnp.maximum(mels, 1e-5))
    return out[0] if squeeze else out
