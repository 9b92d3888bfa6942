"""Multi-session coalescing end-to-end: two concurrent wav2lip sessions
sharing one device worker (--coalesce), both speaking simultaneously,
frames flowing to both queue outputs (SURVEY §2.10 TPU-native equivalent
(a): cross-session device batching)."""

import queue
import time
from threading import Event, Thread

import pytest

from livetalking_tpu import registry
from livetalking_tpu.avatars import wav2lip_avatar as plugin
from livetalking_tpu.config import default_opt
from livetalking_tpu.utils.synthetic import make_synthetic_avatar

B = 2


@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    data_dir = tmp_path_factory.mktemp("data")
    make_synthetic_avatar(str(data_dir / "avatars" / "co1"), n_frames=4)
    make_synthetic_avatar(str(data_dir / "avatars" / "co2"), n_frames=5, seed=7)
    opt = default_opt(dtype="float32")
    model = plugin.load_model("", opt)
    a1 = plugin.load_avatar("co1", str(data_dir))
    a2 = plugin.load_avatar("co2", str(data_dir))
    return model, a1, a2


def _mk_session(model, avatar, sid):
    opt = default_opt(
        transport="queue", tts="dummy", batch_size=B, dtype="float32",
        coalesce=True, sessionid=sid,
    )
    return registry.create("avatar", "wav2lip", opt=opt, model=model, avatar=avatar)


def test_two_sessions_share_scheduler_and_both_stream(stack):
    model, a1, a2 = stack
    s1 = _mk_session(model, a1, "c1")
    s2 = _mk_session(model, a2, "c2")
    assert s1._scheduler is s2._scheduler, "sessions must share the device worker"
    assert s1._store_offset != s2._store_offset

    sched = s1._scheduler
    q1, q2 = Event(), Event()
    t1 = Thread(target=s1.render, args=(q1,), daemon=True)
    t2 = Thread(target=s2.render, args=(q2,), daemon=True)
    t1.start()
    t2.start()
    try:
        s1.put_msg_txt("session one speaking now for a while")
        s2.put_msg_txt("session two speaking now for a while")

        deadline = time.time() + 120
        f1 = f2 = 0
        while time.time() < deadline and (f1 < 6 or f2 < 6):
            try:
                s1.output.video_queue.get(timeout=0.1)
                f1 += 1
            except queue.Empty:
                pass
            try:
                s2.output.video_queue.get(timeout=0.1)
                f2 += 1
            except queue.Empty:
                pass
        assert f1 >= 6 and f2 >= 6, (f1, f2)
        assert sched.requests_run >= 2
        assert sched.frames_run >= sched.batches_run * B
    finally:
        q1.set()
        q2.set()
        t1.join(timeout=15)
        t2.join(timeout=15)
