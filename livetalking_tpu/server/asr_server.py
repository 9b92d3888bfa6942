"""Local STT WebSocket endpoint speaking the FunASR client protocol.

Mirrors the reference's ``/api/asr`` (reference server/asr_server.py:
124-256): the browser sends a JSON config (``is_speaking: true``), streams
binary PCM16 chunks, then ``is_speaking: false``; the server replies with
``{"text", "mode", "is_final", "timestamp"}``. The reference backs this
with funasr/SenseVoice on the GPU; here the backend is TPU-native
Whisper-tiny run entirely in JAX (models/whisper_encoder.py +
models/whisper_decoder.py, greedy decode under one jit) — no torch in the
inference path.

Loading semantics match the reference exactly (reference
server/asr_server.py:33-67): lazy singleton with double-checked locking,
and inference serialized by a lock (one decode at a time on the chip;
concurrent requests queue).
"""

from __future__ import annotations

import asyncio
import json
import os
import threading
import time
from typing import Optional, Protocol

import numpy as np
from aiohttp import web

from livetalking_tpu.utils.audio import resample
from livetalking_tpu.utils.logger import logger

SAMPLE_RATE = 16000  # browser client records 16 kHz mono PCM16

# OpenAI Whisper's decoding fallback bar: gzip ratio above this means the
# text is a repetition loop
COMPRESSION_RATIO_THRESHOLD = 2.4


def compression_ratio(text: str) -> float:
    """len(bytes)/len(gzip(bytes)) — degenerate repetitions compress far
    better than natural language."""
    import zlib

    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


class SttBackend(Protocol):
    def transcribe(self, audio: np.ndarray, sample_rate: int,
                   language: str = "auto") -> str:
        """float32 PCM in [-1,1] -> transcript text. Blocking."""
        ...


class WhisperJaxSTT:
    """Whisper-tiny STT fully in JAX: whisper log-mel (ops/whisper_mel.py)
    -> encoder final hidden state -> KV-cached greedy decoder."""

    def __init__(self, models_dir: str = "./models", max_new: int = 128):
        import jax
        import jax.numpy as jnp
        import transformers

        from livetalking_tpu.models import whisper_decoder as wd
        from livetalking_tpu.models import whisper_encoder as we
        from livetalking_tpu.ops.whisper_mel import log_mel_spectrogram

        wdir = os.path.join(models_dir, "whisper")
        dtype = jnp.bfloat16
        self._cfg = wd.TINY_DECODER
        self._max_new = max_new

        t0 = time.perf_counter()
        tmodel = transformers.WhisperModel.from_pretrained(wdir)
        sd = tmodel.state_dict()
        enc_params = we.convert_torch_state_dict(sd, we.TINY, dtype)
        dec_params = wd.convert_torch_state_dict(sd, self._cfg, dtype)
        self._tokenizer = transformers.WhisperTokenizer.from_pretrained(wdir)
        del tmodel, sd

        enc_cfg = we.TINY

        dec_cfg = self._cfg

        # weights enter the jitted fns as ARGS — closed-over param trees
        # would be inlined into the HLO as constants, growing every compile
        # request by the full weight size (slow/fatal over a remote tunnel)
        @jax.jit
        def encode(params, audio):
            mel = log_mel_spectrogram(audio)[None]  # (1, 80, 3000)
            stacked = we.apply_stacked(params, enc_cfg, mel.astype(dtype))
            return stacked[:, :, -1, :]  # final hidden state (1, 1500, D)

        self._encode = lambda audio: encode(enc_params, audio)
        self._decode = wd.make_greedy_decode(dec_params, self._cfg,
                                             max_new=max_new, dtype=dtype)

        # language-detect step: logits from <|sot|> alone, masked to the
        # language-token block
        @jax.jit
        def detect_lang(params, enc):
            import jax.numpy as jnp  # noqa: F811

            cross_kv = wd.precompute_cross_kv(params, dec_cfg, enc)
            H = dec_cfg.num_heads
            hd = dec_cfg.d_model // H
            caches = [(jnp.zeros((1, H, 2, hd), dtype),
                       jnp.zeros((1, H, 2, hd), dtype))
                      for _ in range(dec_cfg.num_layers)]
            logits, _ = wd.decode_step(
                params, dec_cfg,
                jnp.asarray([dec_cfg.sot], jnp.int32),
                jnp.int32(0), caches, cross_kv)
            ids = jnp.arange(dec_cfg.vocab_size)
            # language tokens end at task_transcribe-2; task_transcribe-1 is <|translate|>
            is_lang = (ids >= dec_cfg.lang_en) & (ids < dec_cfg.task_transcribe - 1)
            return jnp.argmax(jnp.where(is_lang[None], logits, -jnp.inf), -1)

        self._detect_lang = lambda enc: detect_lang(dec_params, enc)
        logger.info("[ASR] WhisperJaxSTT ready in %.1fs (weights: %s)",
                    time.perf_counter() - t0, wdir)

    def transcribe(self, audio: np.ndarray, sample_rate: int,
                   language: str = "auto") -> str:
        import jax.numpy as jnp

        if sample_rate != SAMPLE_RATE:
            audio = resample(audio, sample_rate, SAMPLE_RATE)
        audio = audio[: SAMPLE_RATE * 30].astype(np.float32)
        enc = self._encode(jnp.asarray(audio))

        cfg = self._cfg
        if language == "zh":
            lang_tok = cfg.lang_zh
        elif language == "en":
            lang_tok = cfg.lang_en
        else:
            lang_tok = int(self._detect_lang(enc)[0])

        prompt = jnp.asarray([[cfg.sot, lang_tok, cfg.task_transcribe,
                               cfg.no_timestamps]], jnp.int32)
        # Whisper-style temperature fallback: a transcript that gzip
        # compresses too well is a degenerate repetition loop — retry at
        # increasing temperature (same jitted fn; temperature is a
        # runtime arg, so no recompile per retry).
        text = ""
        for temperature in (0.0, 0.3, 0.6):
            tokens, n_valid = self._decode(enc, prompt,
                                           temperature=temperature,
                                           seed=int(temperature * 10))
            ids = np.asarray(tokens)[0][: int(n_valid[0])]
            text = self._tokenizer.decode(ids,
                                          skip_special_tokens=True).strip()
            if compression_ratio(text) <= COMPRESSION_RATIO_THRESHOLD:
                break
            logger.warning("[ASR] degenerate transcript at T=%.1f "
                           "(compression ratio %.2f) - retrying",
                           temperature, compression_ratio(text))
        return text


# --- lazy singleton loader (reference server/asr_server.py:28-67) --------

_stt_backend: Optional[SttBackend] = None
_stt_load_lock = threading.Lock()
_stt_inference_lock = threading.Lock()


def set_stt_backend(backend: Optional[SttBackend]) -> None:
    """Inject/replace the STT backend (tests, alternate engines)."""
    global _stt_backend
    _stt_backend = backend


def _whisper_dir() -> str:
    return os.path.join(os.environ.get("LIVETALKING_MODELS_DIR", "./models"),
                        "whisper")


def is_funasr_available() -> bool:
    """Availability gate (name kept for parity with the reference import
    site): True when a backend is injected or local whisper weights exist."""
    if _stt_backend is not None:
        return True
    return os.path.isdir(_whisper_dir())


def _load_stt() -> SttBackend:
    """Lazy singleton with double-checked locking: concurrent first
    requests share one model initialization."""
    global _stt_backend
    if _stt_backend is not None:
        return _stt_backend
    with _stt_load_lock:
        if _stt_backend is not None:
            return _stt_backend
        logger.info("[ASR] loading Whisper-tiny JAX STT (first request)...")
        _stt_backend = WhisperJaxSTT(
            models_dir=os.path.dirname(_whisper_dir()))
    return _stt_backend


def _run_inference(audio_float32: np.ndarray, sample_rate: int,
                   language: str):
    """Blocking transcription — call from ``run_in_executor``. Returns
    (text, inference_ms, audio_duration_s)."""
    backend = _load_stt()
    t0 = time.perf_counter()
    with _stt_inference_lock:
        text = backend.transcribe(audio_float32, sample_rate, language)
    inference_ms = (time.perf_counter() - t0) * 1000
    audio_duration_s = len(audio_float32) / sample_rate
    logger.info(
        "[ASR] inference done: %.0f ms for %.1f s audio (RTF %.3f): %r",
        inference_ms, audio_duration_s,
        inference_ms / 1000 / max(audio_duration_s, 1e-3), text[:100])
    return text, inference_ms, audio_duration_s


# --- WebSocket handler ----------------------------------------------------

async def asr_websocket_handler(request: web.Request) -> web.WebSocketResponse:
    """FunASR-protocol handler (see module docstring for the flow)."""
    ws = web.WebSocketResponse()
    await ws.prepare(request)
    logger.info("[ASR] websocket connected from %s", request.remote)

    audio_buffer = bytearray()
    config: dict = {}
    chunks = 0

    try:
        async for msg in ws:
            if msg.type == web.WSMsgType.TEXT:
                try:
                    data = json.loads(msg.data)
                except json.JSONDecodeError:
                    logger.warning("[ASR] invalid JSON ignored")
                    continue

                if data.get("is_speaking") is True:
                    config = data
                    audio_buffer = bytearray()
                    chunks = 0
                    logger.info("[ASR] recording started (mode=%s itn=%s)",
                                config.get("mode", "offline"),
                                config.get("itn", True))

                elif data.get("is_speaking") is False:
                    nbytes = len(audio_buffer)
                    logger.info("[ASR] recording stopped: %d chunks, %d bytes",
                                chunks, nbytes)
                    mode = config.get("mode", "offline")
                    response_mode = "2pass-offline" if mode == "2pass" else mode

                    if nbytes < 640:  # < 20 ms
                        await ws.send_str(json.dumps({
                            "text": "", "mode": response_mode,
                            "is_final": True, "timestamp": None}))
                        continue
                    if nbytes % 2:
                        audio_buffer = audio_buffer[:-1]

                    pcm = np.frombuffer(bytes(audio_buffer), np.int16)
                    audio = pcm.astype(np.float32) / 32768.0
                    loop = asyncio.get_event_loop()
                    try:
                        text, _, _ = await loop.run_in_executor(
                            None, _run_inference, audio, SAMPLE_RATE,
                            config.get("language", "auto"))
                        if text:
                            # SenseVoice-parity transcript post-pass:
                            # punctuation + (protocol-flagged) ITN
                            from livetalking_tpu.server.textnorm import (
                                postprocess,
                            )

                            text = postprocess(
                                text, itn=bool(config.get("itn", True)))
                    except Exception:
                        logger.exception("[ASR] inference failed")
                        text = ""

                    await ws.send_str(json.dumps({
                        "text": text, "mode": response_mode,
                        "is_final": True, "timestamp": None}))

            elif msg.type == web.WSMsgType.BINARY:
                audio_buffer.extend(msg.data)
                chunks += 1
            elif msg.type in (web.WSMsgType.ERROR, web.WSMsgType.CLOSE):
                break
    except asyncio.CancelledError:
        logger.info("[ASR] websocket handler cancelled")
    except Exception:
        logger.exception("[ASR] websocket handler error")

    logger.info("[ASR] websocket disconnected (%s)", request.remote)
    return ws
