"""Offline avatar-build pipelines (the reference's ``genavatar`` scripts,
SURVEY §2.8): video/images -> per-frame face boxes -> model-specific
avatar directories (wav2lip / musetalk / ultralight formats)."""

from livetalking_tpu.genavatar.pipeline import (  # noqa: F401
    generate_ernerf_avatar,
    generate_musetalk_avatar,
    generate_ultralight_avatar,
    generate_wav2lip_avatar,
)
