"""Whisper log-mel spectrogram in JAX (the MuseTalk audio front-end).

Numerics match openai-whisper / HF ``WhisperFeatureExtractor`` (the
reference runs the HF extractor in
avatars/musetalk/whisper/audio2feature.py:118-123): pad/truncate to 30 s,
centered STFT with reflect padding (n_fft 400, hop 160, periodic Hann),
power spectrum with the trailing frame dropped, slaney mel (80 mels,
0-8 kHz), log10 clamped at 1e-10, floored at global max - 8, then
(x + 4) / 4.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from livetalking_tpu.ops.mel import MelConfig, mel_filterbank

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160
N_MELS = 80
CHUNK_SECONDS = 30
N_SAMPLES = SAMPLE_RATE * CHUNK_SECONDS  # 480000
N_FRAMES = N_SAMPLES // HOP  # 3000


def whisper_mel_filters() -> np.ndarray:
    cfg = MelConfig(sample_rate=SAMPLE_RATE, n_fft=N_FFT, n_mels=N_MELS,
                    fmin=0.0, fmax=8000.0)
    return mel_filterbank(cfg)


def log_mel_spectrogram(audio: jnp.ndarray,
                        n_samples: int = N_SAMPLES) -> jnp.ndarray:
    """(T,) float32 PCM (T <= n_samples) -> (80, n_samples/160) log-mel.

    Default pads to the full 30 s whisper chunk like the HF extractor, so
    downstream feature windows beyond real audio see "silence" features
    (the reference relies on this). A smaller ``n_samples`` (multiple of
    HOP*2 so encoder positions stay frame-aligned) yields the identical
    mel values for the real frames over a shorter static window — the
    serving fast path: the encoder then attends over ~20x fewer
    positions (whisper_features.py short_window)."""
    T = audio.shape[0]
    assert T <= n_samples, "audio longer than the mel window"
    assert n_samples % (2 * HOP) == 0
    x = jnp.pad(audio.astype(jnp.float32), (0, n_samples - T))

    pad = N_FFT // 2
    x = jnp.pad(x, (pad, pad), mode="reflect")
    n_frames = 1 + n_samples // HOP  # +1 before trailing drop
    idx = jnp.arange(n_frames)[:, None] * HOP + jnp.arange(N_FFT)[None, :]
    win = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(N_FFT) / N_FFT)
    frames = x[idx] * win

    spec = jnp.abs(jnp.fft.rfft(frames, n=N_FFT, axis=-1)) ** 2  # (F+1, 201)
    spec = spec[:-1]  # whisper drops the trailing frame
    fb = jnp.asarray(whisper_mel_filters())  # (80, 201)
    mel = jnp.dot(spec, fb.T, preferred_element_type=jnp.float32)  # (F, 80)

    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).T  # (80, F)
