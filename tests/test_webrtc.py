"""WebRTC bridge tests with aiortc/PyAV replaced by fake modules — the
reference's own heavy-dep testing technique (reference
tests/test_asr_server.py:29-72, SURVEY §4): inject ``types.ModuleType``
stand-ins through sys.modules before importing the module under test."""

import asyncio
import sys
import types
from threading import Event

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# fakes
# ---------------------------------------------------------------------------

class FakeVideoFrame:
    def __init__(self, arr=None):
        self.arr = arr
        self.pts = None
        self.time_base = None

    @classmethod
    def from_ndarray(cls, arr, format=None):
        return cls(arr)


class _Plane:
    def __init__(self):
        self.data = b""

    def update(self, b):
        self.data = b


class FakeAudioFrame:
    def __init__(self, format=None, layout=None, samples=0):
        self.format = format
        self.layout = layout
        self.samples = samples
        self.planes = [_Plane()]
        self.sample_rate = None
        self.pts = None
        self.time_base = None


class FakeMediaStreamTrack:
    def __init__(self):
        self.readyState = "live"

    def stop(self):
        self.readyState = "ended"


@pytest.fixture(scope="module")
def webrtc_mod():
    av_mod = types.ModuleType("av")
    av_mod.VideoFrame = FakeVideoFrame
    av_mod.AudioFrame = FakeAudioFrame
    aiortc_mod = types.ModuleType("aiortc")
    aiortc_mod.MediaStreamTrack = FakeMediaStreamTrack
    saved = {k: sys.modules.get(k) for k in ("av", "aiortc", "livetalking_tpu.server.webrtc")}
    sys.modules["av"] = av_mod
    sys.modules["aiortc"] = aiortc_mod
    sys.modules.pop("livetalking_tpu.server.webrtc", None)
    import livetalking_tpu.server.webrtc as mod

    yield mod
    for k, v in saved.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v


class FakeSession:
    def __init__(self):
        self.sessionid = "t"
        self.events = []
        self.render_started = Event()
        self.output = types.SimpleNamespace(_player=None)

    def render(self, quit_event):
        self.render_started.set()
        quit_event.wait(5)

    def notify(self, ev):
        self.events.append(ev)


def test_player_wires_into_streamout(webrtc_mod):
    sess = FakeSession()
    player = webrtc_mod.HumanPlayer(sess)
    assert sess.output._player is player


def test_recv_paces_and_fires_eventpoints(webrtc_mod):
    sess = FakeSession()
    player = webrtc_mod.HumanPlayer(sess)

    async def scenario():
        # first recv lazily starts the render thread; preload frames after
        # the loop is bound
        player._start(player.video)
        player.push_video(np.zeros((48, 64, 3), np.uint8))
        player.push_video(np.ones((48, 64, 3), np.uint8))
        player.push_audio(np.zeros(320, np.int16), {"status": "start", "text": "hi"})
        await asyncio.sleep(0)  # let call_soon_threadsafe callbacks run

        f0 = await player.video.recv()
        f1 = await player.video.recv()
        a0 = await player.audio.recv()
        return f0, f1, a0

    f0, f1, a0 = asyncio.run(scenario())
    assert sess.render_started.is_set(), "render thread must start lazily"
    assert f0.pts == 0 and f1.pts == 3600  # 40 ms at the 90 kHz clock
    assert a0.pts == 0 and len(a0.planes[0].data) == 640  # 320 s16 samples
    assert sess.events == [{"status": "start", "text": "hi"}]
    player.stop()


def test_queue_drop_oldest(webrtc_mod):
    sess = FakeSession()
    player = webrtc_mod.HumanPlayer(sess)

    async def scenario():
        player._start(player.video)
        for i in range(105):
            player.push_video(np.full((2, 2, 3), i, np.uint8))
        await asyncio.sleep(0)
        assert player.get_buffer_size() == 100
        first = await player.video.recv()
        return first

    first = asyncio.run(scenario())
    # oldest 5 dropped: the head frame is i=5
    assert int(first.arr[0, 0, 0]) == 5
    player.stop()
