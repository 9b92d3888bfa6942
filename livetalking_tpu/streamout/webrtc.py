"""WebRTC / rtcpush output: thin bridge to the session's HumanPlayer
(reference streamout/webrtc.py:14-43). The HumanPlayer sets itself as
``_player`` when the peer connection is built."""

from __future__ import annotations

from typing import Optional

from livetalking_tpu.registry import register
from livetalking_tpu.streamout.base import BaseOutput


@register("streamout", "webrtc")
@register("streamout", "rtcpush")
class WebRTCOutput(BaseOutput):
    def __init__(self, opt=None, parent=None, **kw):
        super().__init__(opt, parent)
        self._player = None

    def start(self) -> None:
        pass  # lifecycle owned by rtc_manager

    def push_video_frame(self, frame) -> None:
        if self._player:
            self._player.push_video(frame)

    def push_audio_frame(self, frame, eventpoint: Optional[dict] = None) -> None:
        if self._player:
            self._player.push_audio(frame, eventpoint)

    def get_buffer_size(self) -> int:
        if self._player and hasattr(self._player, "get_buffer_size"):
            return self._player.get_buffer_size()
        return 0

    def stop(self) -> None:
        pass
