"""Golden tests for the JAX mel front-end.

Two independent oracles:
  1. a straight numpy re-derivation of the reference mel math
     (reference avatars/wav2lip/audio.py:45-122) using scipy lfilter and
     numpy FFT;
  2. torch.stft as a third-party STFT implementation for the framing/FFT
     core (centered, zero-padded, periodic Hann) to guard against
     correlated bugs in (1).
"""

import numpy as np
import pytest
import scipy.signal

from livetalking_tpu.ops.mel import (
    MelConfig,
    make_mel_chunks_fn,
    mel_chunk_starts,
    mel_filterbank,
    melspectrogram,
    num_mel_frames,
)

CFG = MelConfig()


def numpy_melspectrogram(wav: np.ndarray, cfg: MelConfig = CFG) -> np.ndarray:
    """Independent numpy oracle for the full reference mel chain."""
    y = scipy.signal.lfilter([1.0, -cfg.preemphasis], [1.0], wav.astype(np.float64))
    pad = cfg.n_fft // 2
    y = np.pad(y, (pad, pad))
    n_frames = 1 + wav.shape[0] // cfg.hop
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(cfg.win) / cfg.win)
    spec = np.empty((n_frames, 1 + cfg.n_fft // 2))
    for i in range(n_frames):
        seg = y[i * cfg.hop : i * cfg.hop + cfg.n_fft] * win
        spec[i] = np.abs(np.fft.rfft(seg, n=cfg.n_fft))
    mel = mel_filterbank(cfg).astype(np.float64) @ spec.T
    db = 20 * np.log10(np.maximum(1e-5, mel)) - cfg.ref_level_db
    v = cfg.max_abs_value
    return np.clip((2 * v) * ((db - cfg.min_level_db) / (-cfg.min_level_db)) - v, -v, v)


@pytest.fixture
def wav(rng):
    # 1.04 s of band-limited noise + tone, the per-step window size for B=16
    t = np.arange(16640) / 16000.0
    x = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(16640)
    return x.astype(np.float32)


def test_mel_matches_numpy_oracle(wav):
    got = np.asarray(melspectrogram(wav))
    want = numpy_melspectrogram(wav)
    assert got.shape == want.shape == (80, 84)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_stft_core_matches_torch(wav):
    torch = pytest.importorskip("torch")
    # isolate the STFT core: disable preemphasis to compare framing+FFT only
    cfg = MelConfig(preemphasis=0.0)
    x = torch.from_numpy(wav)
    st = torch.stft(
        x, n_fft=800, hop_length=200, win_length=800,
        window=torch.hann_window(800, periodic=True),
        center=True, pad_mode="constant", return_complex=True,
    )
    mag = st.abs().numpy()  # (401, 84)
    mel = mel_filterbank(cfg) @ mag
    db = 20 * np.log10(np.maximum(1e-5, mel)) - 20.0
    want = np.clip(8.0 * ((db + 100.0) / 100.0) - 4.0, -4.0, 4.0)
    got = np.asarray(melspectrogram(wav, cfg))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_filterbank_shape_and_coverage():
    fb = mel_filterbank()
    assert fb.shape == (80, 401)
    assert (fb >= 0).all()
    # every mel band has support; mid-range FFT bins are covered
    assert (fb.sum(axis=1) > 0).all()
    covered = fb.sum(axis=0)
    freqs = np.linspace(0, 8000, 401)
    inside = (freqs > 100) & (freqs < 7500)
    assert (covered[inside] > 0).all()


def test_chunk_starts_match_reference_loop():
    # reference avatars/audio_features/mel.py:49-64 with defaults
    B, l, r, fps = 16, 10, 10, 25
    starts = mel_chunk_starts(B, 2 * B + l + r, l, r, fps)
    total = num_mel_frames((2 * B + l + r) * 320)
    want = []
    for i in range(B):
        s = int(16.0 + i * 3.2)
        want.append(min(s, total - 16))
    assert starts.tolist() == want


def test_mel_chunks_fn_end_to_end(wav):
    fn = make_mel_chunks_fn(batch_size=16, stride_left=10, stride_right=10, fps=25)
    out = np.asarray(fn(wav))
    assert out.shape == (16, 80, 16)
    full = numpy_melspectrogram(wav)
    starts = mel_chunk_starts(16, 52, 10, 10, 25)
    for i, s in enumerate(starts):
        np.testing.assert_allclose(out[i], full[:, s : s + 16], atol=2e-3)


def test_whisper_log_mel_short_window_matches_full():
    """log_mel_spectrogram(n_samples=short) yields the IDENTICAL mel
    columns for the real frames as the 30 s-padded default — the
    --whisper_short_window fast path changes only the encoder context."""
    import jax.numpy as jnp

    from livetalking_tpu.ops.whisper_mel import HOP, log_mel_spectrogram

    rng = np.random.default_rng(0)
    T = 32000  # 2 s
    audio = jnp.asarray(rng.standard_normal(T).astype(np.float32) * 0.1)
    short_n = ((T + 2 * HOP - 1) // (2 * HOP)) * 2 * HOP
    full = np.asarray(log_mel_spectrogram(audio))
    short = np.asarray(log_mel_spectrogram(audio, n_samples=short_n))
    cols = T // HOP - 2  # stay clear of the reflect-pad boundary column
    np.testing.assert_allclose(short[:, :cols], full[:, :cols],
                               atol=1e-5, rtol=1e-5)
