"""Whisper feature extractor for MuseTalk.

Per ``run_step`` (reference avatars/audio_features/whisper.py:58-76):
ingest ``2*batch_size`` 20 ms chunks, run the whisper-tiny encoder over the
rolling window (zero-padded to the 30 s whisper chunk, as the HF extractor
does), stack all hidden states to a (1500, layers+1, 384) feature array,
and slice per-video-frame windows ``[0, 5]`` at 50 Hz (multiplier 2, start
l/2), each reshaped to (50, 384) cross-attention context rows.

The mel, encoder, window gather and reshape are one jitted static-shape
device program; the (B, 50, 384) context batch stays device-resident for
the latent U-Net step.
"""

from __future__ import annotations

import numpy as np

from livetalking_tpu.audio_features.base import BaseFeatureExtractor, clamp_window_indices
from livetalking_tpu.utils.logger import logger


def make_batched_encode_factory(whisper_params, whisper_cfg, batch_size: int,
                                l: int, r: int,
                                short_window: bool = False, fps: int = 25):
    """``batched_fn_factory`` for engine.feature_coalescer.FeatureCoalescer:
    factory(k) -> fn((k, n_samples) float32 np) -> (k, B, n_ctx, D) device.

    One batched program encodes k sessions' rolling windows together —
    the same mel/encoder/gather as the per-session jitted program, so
    rows of the batched output equal the solo outputs exactly."""
    import jax
    import jax.numpy as jnp

    from livetalking_tpu.models import whisper_encoder as we
    from livetalking_tpu.ops.whisper_mel import log_mel_spectrogram

    cfg = whisper_cfg or we.TINY
    window_frames = 2 * batch_size + l + r
    # chunk size must match BaseFeatureExtractor (base.py): a session
    # built at a different --fps pads to a different window length, and
    # the coalescer worker asserts on the wav shape
    n_samples = window_frames * (16000 // (fps * 2))
    if short_window:
        mel_samples = ((n_samples + 319) // 320) * 320
        feat_len = mel_samples // 320
    else:
        mel_samples = None
        feat_len = cfg.max_positions
    rows = clamp_window_indices(batch_size, feat_len, (0, 5),
                                start=l // 2, multiplier=2.0)
    n_ctx = rows.shape[1] * (cfg.num_layers + 1)

    def factory(k: int):
        @jax.jit
        def fn(params, wavs):  # (k, n_samples)
            if mel_samples is not None:
                mels = jax.vmap(lambda w: log_mel_spectrogram(
                    w, n_samples=mel_samples))(wavs)
            else:
                mels = jax.vmap(log_mel_spectrogram)(wavs)
            # mel stays f32 — EXACTLY the per-session program (which feeds
            # f32 mel and lets the encoder upcast), so coalesced rows are
            # bit-identical to solo features for any param dtype
            states = we.apply_stacked(params, cfg, mels)
            g = jnp.take(states, jnp.asarray(rows).reshape(-1), axis=1)
            return g.reshape(k, batch_size, n_ctx,
                             cfg.d_model).astype(jnp.float32)

        return lambda wavs: fn(whisper_params, jnp.asarray(wavs))

    return factory, n_samples


class WhisperFeatures(BaseFeatureExtractor):
    def __init__(self, opt, parent=None, whisper_params=None, whisper_cfg=None,
                 audio_feat_length=(0, 5), coalescer=None):
        super().__init__(opt, parent)
        # cross-session batched encoding (engine/feature_coalescer.py)
        self._coalescer = coalescer
        import jax
        import jax.numpy as jnp

        from livetalking_tpu.models import whisper_encoder as we
        from livetalking_tpu.ops.whisper_mel import log_mel_spectrogram

        self._cfg = whisper_cfg or we.TINY
        self._params = whisper_params
        self.audio_feat_length = tuple(audio_feat_length)

        self._window_frames = 2 * self.batch_size + self.stride_left_size + self.stride_right_size
        n_samples = self._window_frames * self.chunk

        # serving fast path (--whisper_short_window): run the encoder over
        # the actual rolling window instead of the 30 s zero-padded chunk
        # — identical mel values for the real frames, ~20x fewer encoder
        # positions (attention is the cost). OFF by default: the padded
        # window is the exact distribution HF/reference nets were fed.
        short = bool(getattr(opt, "whisper_short_window", False))
        if short:
            mel_samples = ((n_samples + 319) // 320) * 320  # pos-aligned
            feat_len = mel_samples // 320  # encoder positions at 50 Hz
        else:
            mel_samples = None  # full 30 s pad
            feat_len = self._cfg.max_positions  # 1500
        rows = clamp_window_indices(
            self.batch_size, feat_len, self.audio_feat_length,
            start=self.stride_left_size // 2, multiplier=2.0,
        )  # (B, 10)
        rows_dev = jnp.asarray(rows)
        n_ctx = rows.shape[1] * (self._cfg.num_layers + 1)  # 10 * 5 = 50
        D = self._cfg.d_model

        cfg = self._cfg

        # params enter as a jit ARG: a closed-over param tree would be
        # inlined into the HLO as constants, growing the compile request
        # by the full weight size (fatal behind a remote-compile tunnel)
        @jax.jit
        def features(params, wav):  # (n_samples,) -> (B, 50, 384)
            if mel_samples is not None:  # short rolling window
                mel = log_mel_spectrogram(wav, n_samples=mel_samples)[None]
            else:
                mel = log_mel_spectrogram(wav)[None]  # (1, 80, 3000)
            states = we.apply_stacked(params, cfg, mel)[0]  # (T/2, L+1, D)
            g = jnp.take(states, rows_dev.reshape(-1), axis=0)
            g = g.reshape(self.batch_size, n_ctx, D)
            return g.astype(jnp.float32)

        self._fn = lambda wav: features(self._params, wav)
        self._n_samples = n_samples
        self._zero = jnp.zeros((self.batch_size, n_ctx, D), jnp.float32)
        self.last_is_silence = True

    def run_step(self) -> None:
        n_speech = self._ingest_step_frames()
        is_all_silence = n_speech == 0
        if len(self.frames) <= self.stride_left_size + self.stride_right_size:
            return

        if is_all_silence and self.last_is_silence:
            # sustained silence: no encoder run (the inference thread skips
            # the U-Net too) — same fast path as the HuBERT extractor
            feats = self._zero
        else:
            audio = np.concatenate(self.frames).astype(np.float32)
            if audio.shape[0] < self._n_samples:
                audio = np.concatenate(
                    [np.zeros(self._n_samples - audio.shape[0], np.float32), audio])
            elif audio.shape[0] > self._n_samples:
                audio = audio[-self._n_samples:]
            if self._coalescer is not None:
                # cross-session batched encode: one device program per
                # tick for all speaking sessions (the per-session encode
                # staggers scheduler submissions — see SERVING_r02.json)
                try:
                    feats = self._coalescer.encode(audio)
                except Exception as e:
                    # a wedged/stopped coalescer must not kill the render
                    # loop (reference degradation model: the avatar idles
                    # instead of stalling, cf. silence synthesis in
                    # reference basereal.py / base_asr.py) — emit silence
                    # features for this tick and keep the session alive
                    logger.warning(
                        "feature coalescer encode failed (%s): "
                        "silence features this tick", e)
                    feats = self._zero
            else:
                feats = self._fn(audio)

        self.feat_queue.put(feats)
        self._trim_frames()
        self.last_is_silence = is_all_silence
