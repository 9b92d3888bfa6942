"""HuBERT feature extractor for the Ultralight model family.

Per ``run_step`` (reference avatars/audio_features/hubert.py:24-49): ingest
``2*batch_size`` 20 ms chunks; when the whole step AND the previous step
were silence, emit zero features without running the network; otherwise run
HuBERT over the rolling window and slice per-frame windows of
``audio_feat_length=[4,4]`` at 50 Hz (multiplier 2, start l/2), each
reshaped to a (16, 32, 32) feature image.

TPU design: the HuBERT encoder + the clamp-to-edge window gather + the
(16, 1024) -> (16, 32, 32) reshape are one jitted static-shape program over
the fixed 1.04 s window; features stay device-resident.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from livetalking_tpu.audio_features.base import BaseFeatureExtractor, clamp_window_indices


class HubertFeatures(BaseFeatureExtractor):
    def __init__(self, opt, parent=None, hubert_params=None, hubert_cfg=None,
                 audio_feat_length=(4, 4)):
        super().__init__(opt, parent)
        import jax
        import jax.numpy as jnp

        from livetalking_tpu.models import hubert as hub

        self._cfg = hubert_cfg or hub.LARGE
        self._params = hubert_params
        self.audio_feat_length = tuple(audio_feat_length)
        self.last_is_silence = True

        self._window_frames = 2 * self.batch_size + self.stride_left_size + self.stride_right_size
        n_samples = self._window_frames * self.chunk
        feat_len = self._cfg.out_length(n_samples)
        win = self.audio_feat_length
        rows = clamp_window_indices(
            self.batch_size, feat_len, win, start=self.stride_left_size // 2, multiplier=2.0
        )  # (B, (win0+win1)*2)
        n_ctx = rows.shape[1]
        hidden = self._cfg.hidden_size
        # (n_ctx, hidden) flattens to n_ctx planes of 32x32 (reference
        # ultralight_avatar.py:164 arr.reshape(16, 32, 32))
        self._plane = int(np.sqrt(hidden))
        assert self._plane * self._plane == hidden, "hidden must be a square for the reshape"
        rows_dev = jnp.asarray(rows)

        cfg = self._cfg
        plane = self._plane

        # params as a jit ARG: closed-over weights would be inlined as HLO
        # constants — for HuBERT-large that is ~0.6 GB in the compile
        # request, which a remote-compile tunnel rejects outright
        @jax.jit
        def features(params, wav):  # (n_samples,)
            h = hub.apply(params, cfg, wav[None, :])[0]  # (feat_len, hidden)
            g = jnp.take(h, rows_dev.reshape(-1), axis=0).reshape(
                self.batch_size, n_ctx, plane, plane
            )
            return g.astype(jnp.float32)  # (B, n_ctx, 32, 32)

        self._fn = lambda wav: features(self._params, wav)
        self._zero = jnp.zeros(
            (self.batch_size, n_ctx, self._plane, self._plane), jnp.float32
        )
        self._n_samples = n_samples

    def run_step(self) -> None:
        n_speech = self._ingest_step_frames()
        is_all_silence = n_speech == 0
        if len(self.frames) <= self.stride_left_size + self.stride_right_size:
            return

        if is_all_silence and self.last_is_silence:
            feats = self._zero  # no network on sustained silence
        else:
            audio = np.concatenate(self.frames).astype(np.float32)
            if audio.shape[0] < self._n_samples:
                audio = np.concatenate(
                    [np.zeros(self._n_samples - audio.shape[0], np.float32), audio]
                )
            elif audio.shape[0] > self._n_samples:
                audio = audio[-self._n_samples:]
            feats = self._fn(audio)

        self.feat_queue.put(feats)
        self._trim_frames()
        self.last_is_silence = is_all_silence
