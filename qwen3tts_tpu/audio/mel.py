"""Log-mel front end for the speaker encoder (voice cloning).

Semantics match the reference host-side DSP exactly
(src/audio_tokenizer_encoder.cpp:14-125, 288-371):

- reflect padding of (n_fft - hop) / 2 samples on both sides
- periodic Hann window of win_length centered in the n_fft frame
- magnitude spectrum sqrt(re^2 + im^2 + 1e-9)
- slaney-normalized mel filterbank (librosa convention, linear < 1 kHz)
- dynamic-range compression log(clamp(x, 1e-5))

but computed with an O(N log N) batched rFFT on device instead of the
reference's naive O(N^2) DFT, which it measured at 64% of clone-mode wall time
(OPTIMIZATION.md:97-107).

Sample buffers are padded to static buckets; the true length is a traced
scalar and all reflection indices / frame validity derive from it, so padding
is numerically invisible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SpeakerEncoderConfig


def slaney_mel_filterbank(cfg: SpeakerEncoderConfig) -> np.ndarray:
    """[n_mels, n_fft//2 + 1] float32, computed once on host (constant)."""
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0

    def hz_to_mel(hz):
        hz = np.asarray(hz, np.float64)
        return np.where(hz < min_log_hz, hz / f_sp,
                        min_log_mel + np.log(np.maximum(hz, 1e-10) / min_log_hz) / logstep)

    def mel_to_hz(mel):
        mel = np.asarray(mel, np.float64)
        return np.where(mel < min_log_mel, f_sp * mel,
                        min_log_hz * np.exp(logstep * (mel - min_log_mel)))

    n_bins = cfg.n_fft // 2 + 1
    mel_min = hz_to_mel(cfg.f_min)
    mel_max = hz_to_mel(cfg.f_max)
    mel_points = mel_min + (mel_max - mel_min) * np.arange(cfg.n_mels + 2) / (cfg.n_mels + 1)
    hz = mel_to_hz(mel_points)
    freqs = np.arange(n_bins) * cfg.sample_rate / cfg.n_fft

    fb = np.zeros((cfg.n_mels, n_bins), np.float64)
    for m in range(cfg.n_mels):
        left, center, right = hz[m], hz[m + 1], hz[m + 2]
        enorm = 2.0 / (right - left)
        up = (freqs - left) / max(center - left, 1e-10)
        down = (right - freqs) / max(right - center, 1e-10)
        tri = np.where((freqs >= left) & (freqs <= center), up,
                       np.where((freqs > center) & (freqs <= right), down, 0.0))
        fb[m] = enorm * np.clip(tri, 0.0, None)
    return fb.astype(np.float32)


def centered_hann(cfg: SpeakerEncoderConfig) -> np.ndarray:
    """Periodic Hann of win_length zero-centered inside an n_fft window."""
    w = np.zeros(cfg.n_fft, np.float32)
    offset = (cfg.n_fft - cfg.win_length) // 2
    n = cfg.win_length
    w[offset:offset + n] = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))
    return w


def n_mel_frames(n_samples: int, cfg: SpeakerEncoderConfig) -> int:
    pad = (cfg.n_fft - cfg.hop_length) // 2
    return (n_samples + 2 * pad - cfg.n_fft) // cfg.hop_length + 1


def log_mel(
    samples: jnp.ndarray,     # [Sb] zero-padded sample bucket
    n_samples: jnp.ndarray,   # scalar: true sample count
    cfg: SpeakerEncoderConfig,
    filterbank: jnp.ndarray,  # [n_mels, n_bins]
    window: jnp.ndarray,      # [n_fft]
):
    """Returns (mel [Tf_bucket, n_mels], n_frames scalar). Rows beyond
    n_frames are garbage; the masked ECAPA forward ignores them."""
    Sb = samples.shape[0]
    pad = (cfg.n_fft - cfg.hop_length) // 2
    Tf = n_mel_frames(Sb, cfg)

    # Reflect-pad via dynamic index arithmetic against the true length.
    idx = jnp.arange(Sb + 2 * pad) - pad
    n = n_samples
    src = jnp.where(idx < 0, -idx, idx)
    src = jnp.where(src >= n, 2 * n - 2 - src, src)
    src = jnp.clip(src, 0, Sb - 1)
    padded = samples[src]

    starts = jnp.arange(Tf) * cfg.hop_length
    frames = padded[starts[:, None] + jnp.arange(cfg.n_fft)[None, :]]  # [Tf, n_fft]
    frames = frames.astype(jnp.float32) * window

    spec = jnp.fft.rfft(frames, axis=-1)
    mag = jnp.sqrt(jnp.square(spec.real) + jnp.square(spec.imag) + 1e-9)
    mel = mag @ filterbank.T
    mel = jnp.log(jnp.maximum(mel, 1e-5))

    n_frames = (n + 2 * pad - cfg.n_fft) // cfg.hop_length + 1
    return mel, n_frames
