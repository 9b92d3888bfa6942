"""Output transports. Contract (reference streamout/base_output.py:14-53):
``start`` / ``push_video_frame`` / ``push_audio_frame`` / ``get_buffer_size``
(engine back-pressure) / ``stop``."""

OUTPUT_MODULES = {
    "webrtc": "livetalking_tpu.streamout.webrtc",
    "rtcpush": "livetalking_tpu.streamout.webrtc",
    "rtmp": "livetalking_tpu.streamout.rtmp",
    "virtualcam": "livetalking_tpu.streamout.virtualcam",
    "queue": "livetalking_tpu.streamout.local",
    "null": "livetalking_tpu.streamout.local",
}
