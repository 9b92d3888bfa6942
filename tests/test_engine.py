"""End-to-end engine pipeline test (CPU JAX, queue transport, dummy TTS).

Drives the full per-session pipeline of SURVEY §3.3: text -> DummyTTS ->
20 ms chunks -> mel feature ring buffer -> fused wav2lip device step ->
paste-back -> queue streamout, asserting frames, A/V ratios, eventpoints,
speaking state, and interrupt semantics.
"""

import queue
import time
from threading import Event, Thread

import numpy as np
import pytest

from livetalking_tpu import registry
from livetalking_tpu.avatars import wav2lip_avatar as plugin
from livetalking_tpu.config import default_opt
from livetalking_tpu.utils.synthetic import make_synthetic_avatar

B = 2  # small batch for CPU speed


@pytest.fixture(scope="module")
def avatar_assets(tmp_path_factory):
    d = tmp_path_factory.mktemp("avatar") / "syn1"
    make_synthetic_avatar(str(d), n_frames=6)
    return d


@pytest.fixture(scope="module")
def model():
    opt = default_opt(dtype="float32")
    return plugin.load_model("", opt)  # random init


@pytest.fixture
def session(avatar_assets, model):
    opt = default_opt(
        transport="queue", tts="dummy", batch_size=B, dtype="float32",
        sessionid="t1",
    )
    avatar = _load_direct(avatar_assets)
    sess = registry.create("avatar", "wav2lip", opt=opt, model=model, avatar=avatar)
    quit_event = Event()
    t = Thread(target=sess.render, args=(quit_event,), daemon=True)
    t.start()
    yield sess
    quit_event.set()
    t.join(timeout=10)


def _load_direct(avatar_dir):
    import os

    # plugin.load_avatar takes (avatar_id, data_dir) with data_dir/avatars/<id>
    data_dir = os.path.join(str(avatar_dir.parent), "_data")
    os.makedirs(os.path.join(data_dir, "avatars"), exist_ok=True)
    link = os.path.join(data_dir, "avatars", "syn1")
    if not os.path.exists(link):
        os.symlink(str(avatar_dir), link)
    return plugin.load_avatar("syn1", data_dir)


def _drain(q, n, timeout):
    out = []
    deadline = time.time() + timeout
    while len(out) < n and time.time() < deadline:
        try:
            out.append(q.get(timeout=0.2))
        except queue.Empty:
            pass
    return out


def test_silence_produces_idle_frames(session):
    """With no speech the avatar idles: frames flow, speaking=False."""
    # 60 s: on the 1-core CI host a full-suite run can delay the first
    # idle frames well past 20 s (observed flake at 20 s, passes alone)
    frames = _drain(session.output.video_queue, 4, timeout=60)
    assert len(frames) == 4
    assert frames[0].shape == (480, 640, 3)
    assert not session.is_speaking()


def test_speech_to_frames_with_eventpoints(session):
    events = queue.Queue()
    session.add_msgqueue(events)

    session.put_msg_txt("hello world this is a test")
    # wait until speech frames flow and state flips
    deadline = time.time() + 60
    spoke = False
    while time.time() < deadline:
        if session.is_speaking():
            spoke = True
            break
        time.sleep(0.1)
    assert spoke, "session never entered speaking state"

    frames = _drain(session.output.video_queue, 6, timeout=60)
    assert len(frames) == 6

    # audio/video cadence: 2 audio frames per video frame
    a, v = session.output.audio_queue.qsize(), session.output.video_queue.qsize()
    # eventpoints: start must have been emitted via notify at playback
    deadline = time.time() + 30
    seen = []
    while time.time() < deadline and not any('"start"' in m for m in seen):
        try:
            seen.append(events.get(timeout=0.5))
        except queue.Empty:
            pass
    assert any('"start"' in m for m in seen), f"no start eventpoint in {seen}"


def test_interrupt_flushes_speech(session):
    session.put_msg_txt("a very long sentence that will be interrupted " * 20)
    deadline = time.time() + 60
    while time.time() < deadline and not session.is_speaking():
        time.sleep(0.1)
    assert session.is_speaking()
    session.flush_talk()
    # after flush the TTS queue is empty and state returns to silence
    deadline = time.time() + 30
    while time.time() < deadline and session.is_speaking():
        time.sleep(0.2)
    assert not session.is_speaking()
    assert session.tts.msgqueue.qsize() == 0


def test_audio_passthrough_is_int16(session):
    frame, _ev = session.output.audio_queue.get(timeout=20)
    assert frame.dtype == np.int16
    assert frame.shape == (320,)


def test_single_chunk_stream_emits_start_and_end():
    """A one-chunk audio stream must surface BOTH eventpoints (start on
    the chunk, end on a trailing silence chunk) - subscribers gate on
    start before end."""
    from livetalking_tpu.avatars.base_avatar import BaseAvatar
    from livetalking_tpu.config import default_opt

    opt = default_opt(transport="null", tts="dummy", batch_size=2,
                      sessionid="ev1")
    sess = BaseAvatar(opt)
    seen = []

    class FakeAsr:
        def put_audio_frame(self, chunk, eventpoint):
            seen.append((len(chunk), dict(eventpoint)))

    sess.asr = FakeAsr()
    sess._put_pcm_stream(np.zeros(sess.chunk, np.float32), {"text": "hi"})
    statuses = [e.get("status") for _n, e in seen]
    assert statuses == ["start", "end"], seen
    assert all(n == sess.chunk for n, _e in seen)
    assert all(e.get("text") == "hi" for _n, e in seen)
