"""Avatar engine + model plugins.

Plugin module paths keyed by ``--model``, loaded lazily by the app
(reference app.py:128-132)."""

AVATAR_MODULES = {
    "wav2lip": "livetalking_tpu.avatars.wav2lip_avatar",
    "musetalk": "livetalking_tpu.avatars.musetalk_avatar",
    "ultralight": "livetalking_tpu.avatars.ultralight_avatar",
    "ernerf": "livetalking_tpu.avatars.ernerf_avatar",
}
