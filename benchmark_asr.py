"""ASR (speech-to-text) latency benchmark.

Mirrors the reference's methodology (reference benchmark_asr.py:44-59,
236-259): run the STT backend N times over the same utterance, report
avg / min / max latency and real-time factor (RTF), with a deterministic
seeded synthetic-audio fallback when no wav file is supplied.

The backend is the JAX Whisper-tiny pipeline the /api/asr endpoint
serves (livetalking_tpu/server/asr_server.py WhisperJaxSTT); when the
pretrained weights are absent it builds the same graphs with random
init so timings still reflect the compiled compute path (transcripts
are then garbage, which the report flags).

Usage: python benchmark_asr.py [--wav file.wav] [--runs 5] [--seconds 5]
"""

from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np


def synthetic_speech(seconds: float, sr: int = 16000, seed: int = 0) -> np.ndarray:
    """Deterministic speech-like audio: a few gliding tones + noise bursts
    (reference benchmark_asr.py synthesizes audio when no fixture exists)."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    sig = np.zeros_like(t, dtype=np.float32)
    for f0, f1, a in ((120, 180, 0.4), (600, 900, 0.2), (1800, 2400, 0.1)):
        freq = np.linspace(f0, f1, t.size)
        sig += a * np.sin(2 * np.pi * np.cumsum(freq) / sr).astype(np.float32)
    env = (0.5 + 0.5 * np.sin(2 * np.pi * 3.0 * t)).astype(np.float32)  # syllables
    sig = sig * env + 0.01 * rng.standard_normal(t.size).astype(np.float32)
    return (sig / np.max(np.abs(sig))).astype(np.float32)


class _RandomInitWhisperSTT:
    """Same compiled graphs as WhisperJaxSTT, random weights (no tokenizer:
    reports token ids). Keeps the benchmark runnable without checkpoints."""

    def __init__(self, max_new: int = 32):
        import jax
        import jax.numpy as jnp

        from livetalking_tpu.models import whisper_decoder as wd
        from livetalking_tpu.models import whisper_encoder as we
        from livetalking_tpu.ops.whisper_mel import log_mel_spectrogram

        dtype = jnp.bfloat16
        cfg_e, cfg_d = we.TINY, wd.TINY_DECODER
        enc_params = we.init_params(jax.random.PRNGKey(0), cfg_e, dtype)
        dec_params = wd.init_params(jax.random.PRNGKey(1), cfg_d, dtype)

        @jax.jit
        def encode(audio):
            mel = log_mel_spectrogram(audio)[None]
            return we.apply_stacked(enc_params, cfg_e, mel.astype(dtype))[:, :, -1, :]

        self._encode = encode
        self._decode = wd.make_greedy_decode(dec_params, cfg_d,
                                             max_new=max_new, dtype=dtype)
        self._cfg = cfg_d

    def transcribe(self, audio: np.ndarray, sample_rate: int,
                   language: str = "auto") -> str:
        import jax.numpy as jnp

        enc = self._encode(jnp.asarray(audio[: 16000 * 30]))
        cfg = self._cfg
        prompt = jnp.asarray([[cfg.sot, cfg.lang_en, cfg.task_transcribe,
                               cfg.no_timestamps]], jnp.int32)
        tokens, n_valid = self._decode(enc, prompt)
        ids = np.asarray(tokens)[0][: int(n_valid[0])]
        return " ".join(str(int(x)) for x in ids[:8])


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--wav", type=str, default="")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--models_dir", type=str, default="./models")
    args = ap.parse_args()
    # budget-aware degradation (bench.py sets BENCH_REMAINING_S)
    if float(os.environ.get("BENCH_REMAINING_S", "1e9")) < 360.0:
        args.runs = min(args.runs, 1)

    if args.wav and os.path.exists(args.wav):
        from livetalking_tpu.utils.audio import load_pcm16k

        audio = load_pcm16k(args.wav)
        source = args.wav
    else:
        audio = synthetic_speech(args.seconds)
        source = f"synthetic {args.seconds:.1f}s (seed 0)"
    dur = audio.size / 16000.0

    random_init = not os.path.isdir(os.path.join(args.models_dir, "whisper"))
    if random_init:
        backend = _RandomInitWhisperSTT()
    else:
        from livetalking_tpu.server.asr_server import WhisperJaxSTT

        backend = WhisperJaxSTT(models_dir=args.models_dir)

    text = backend.transcribe(audio, 16000)  # warm-up / compile
    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        backend.transcribe(audio, 16000)
        times.append(time.perf_counter() - t0)

    avg = sum(times) / len(times)
    print(json.dumps({
        "metric": "whisper_tiny_stt_latency",
        "source": source,
        "audio_s": round(dur, 2),
        "runs": args.runs,
        "avg_ms": round(avg * 1000, 1),
        "min_ms": round(min(times) * 1000, 1),
        "max_ms": round(max(times) * 1000, 1),
        "rtf": round(avg / dur, 4),
        "random_init": random_init,
        "sample_text": text[:80],
    }))


if __name__ == "__main__":
    main()
