"""End-to-end Ultralight pipeline: dummy TTS -> HuBERT features (tiny
config) -> Ultralight U-Net -> paste-back -> queue output."""

import queue
import time
from threading import Event, Thread

import pytest

from livetalking_tpu import registry
from livetalking_tpu.avatars import ultralight_avatar as plugin
from livetalking_tpu.config import default_opt
from livetalking_tpu.utils.synthetic import make_synthetic_avatar

B = 2


@pytest.fixture(scope="module")
def session(tmp_path_factory):
    data_dir = tmp_path_factory.mktemp("data")
    make_synthetic_avatar(
        str(data_dir / "avatars" / "ul1"), n_frames=5, face_size=168, coord_order="xy"
    )
    opt = default_opt(
        transport="queue", tts="dummy", batch_size=B, dtype="float32",
        hubert_size="tiny", sessionid="ul", model="ultralight",
    )
    model = plugin.load_model(opt)
    avatar = plugin.load_avatar("ul1", str(data_dir))
    sess = registry.create("avatar", "ultralight", opt=opt, model=model, avatar=avatar)
    quit_event = Event()
    t = Thread(target=sess.render, args=(quit_event,), daemon=True)
    t.start()
    yield sess
    quit_event.set()
    t.join(timeout=15)


def test_ultralight_speaks_and_streams(session):
    session.put_msg_txt("ultralight end to end check with enough words")
    deadline = time.time() + 120
    frames = []
    spoke = False
    while time.time() < deadline and len(frames) < 8:
        if session.is_speaking():
            spoke = True
        try:
            frames.append(session.output.video_queue.get(timeout=0.5))
        except queue.Empty:
            pass
    assert len(frames) >= 8
    assert frames[0].shape == (480, 640, 3)
    assert spoke, "session never spoke"


def test_silence_skips_network(session):
    # sustained silence -> zero features fast path (no HuBERT forward)
    feats = session.asr.feat_queue.get(timeout=20)
    # during silence the extractor reuses the cached zero block
    import numpy as np

    if not session.is_speaking():
        assert feats.shape == (B, 16, 32, 32)
