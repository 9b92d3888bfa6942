"""Mel-window feature extractor for Wav2Lip.

Per ``run_step`` (reference avatars/audio_features/mel.py:34-67): ingest
``2*batch_size`` 20 ms chunks, concatenate the rolling buffer (l + r stride
context + the new chunks), run the fused mel+slice device function, and put
one (B, 80, 16) device feature batch into ``feat_queue``.

Unlike the reference (librosa on CPU per step, then host-side window
copies), the entire mel chain and the 16-wide window gather run on device
as a single jitted call; the feature batch stays device-resident for the
model step.
"""

from __future__ import annotations

import numpy as np

from livetalking_tpu.audio_features.base import BaseFeatureExtractor
from livetalking_tpu.ops.mel import make_mel_chunks_fn


class MelFeatures(BaseFeatureExtractor):
    def __init__(self, opt, parent=None):
        super().__init__(opt, parent)
        self._fn = make_mel_chunks_fn(
            self.batch_size, self.stride_left_size, self.stride_right_size, self.fps
        )
        self._window_frames = 2 * self.batch_size + self.stride_left_size + self.stride_right_size

    def run_step(self) -> None:
        self._ingest_step_frames()
        if len(self.frames) <= self.stride_left_size + self.stride_right_size:
            return

        audio = np.concatenate(self.frames).astype(np.float32)
        want = self._window_frames * self.chunk
        if audio.shape[0] < want:  # first step without full warm-up context
            audio = np.concatenate([np.zeros(want - audio.shape[0], np.float32), audio])
        elif audio.shape[0] > want:
            audio = audio[-want:]

        feats = self._fn(audio)  # (B, 80, 16) device array
        self.feat_queue.put(feats)
        self._trim_frames()
