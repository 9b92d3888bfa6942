"""TTS plugins. Contract (reference tts/base_tts.py:17-57): a message queue
consumed by a dedicated thread; each plugin synthesizes text to float32
16 kHz mono and pushes 20 ms chunks into the parent avatar with
start/end eventpoints; ``flush_talk`` clears the queue and pauses in-flight
chunk emission."""

# module paths for BaseAvatar's lazy plugin import, keyed by --tts name
TTS_MODULES = {
    "edgetts": "livetalking_tpu.tts.edge",
    "gpt-sovits": "livetalking_tpu.tts.sovits",
    "xtts": "livetalking_tpu.tts.xtts",
    "cosyvoice": "livetalking_tpu.tts.cosyvoice",
    "fishtts": "livetalking_tpu.tts.fish",
    "tencent": "livetalking_tpu.tts.tencent",
    "doubao": "livetalking_tpu.tts.doubao",
    "indextts2": "livetalking_tpu.tts.indextts2",
    "azuretts": "livetalking_tpu.tts.azure",
    "qwentts": "livetalking_tpu.tts.qwentts",
    "omnitts": "livetalking_tpu.tts.omnitts",
    "dummy": "livetalking_tpu.tts.dummy",
}
