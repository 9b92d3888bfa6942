"""Per-frame acoustic feature extractors feeding the lip-sync models.

The reference calls this layer "ASR" (it is feature extraction, not speech
recognition — reference avatars/audio_features/). Contract per extractor:
ingest 20 ms 16 kHz float32 chunks, emit one device feature batch per
``run_step`` into ``feat_queue`` plus the raw audio passthrough into
``output_queue`` (reference avatars/audio_features/base_asr.py:29-88).
"""
